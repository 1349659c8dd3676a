"""Diagnose IVF-L2 vs IVF-IP recall gap: probe coverage vs engine recall.

Coverage = fraction of true top-10 neighbors whose posted cluster is in the
query's nprobe probe set. If coverage ~= engine recall the scan kernel is
fine and the loss is assignment/probing (geometry or kmeans quality); if
coverage >> recall there is a search-path bug.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from lynsedb_tpu.ops.kmeans import train_kmeans, _l2_scores, _ip_scores

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
DIM = 128
NQ = 20
K = 10
NPROBE = 32
rng = np.random.default_rng(0)
data = rng.random((N, DIM), dtype=np.float32)
queries = rng.random((NQ, DIM), dtype=np.float32)
n_clusters = max(64, min(1024, int(N ** 0.5)))

for metric in ("l2", "ip"):
    ip = metric == "ip"
    centroids, assigns = train_kmeans(data, n_clusters, assign_ip=ip, seed=42)
    centroids = np.asarray(centroids, dtype=np.float32)
    assigns = np.asarray(assigns)
    c = jnp.asarray(centroids)
    c_sq = jnp.sum(c * c, axis=-1)
    qj = jnp.asarray(queries)
    if ip:
        keyed = _ip_scores(qj, c)
        gt = np.argsort(-(queries @ data.T), axis=1)[:, :K]
    else:
        keyed = -_l2_scores(qj, c, c_sq)
        d2 = ((queries ** 2).sum(1)[:, None] + (data ** 2).sum(1)[None, :]
              - 2 * queries @ data.T)
        gt = np.argsort(d2, axis=1)[:, :K]
    probe = np.asarray(jnp.argsort(-keyed, axis=1))[:, :NPROBE]

    # replica postings for IP (engine uses 2 replicas under IP)
    replicas = 2 if ip else 1
    if replicas > 1:
        d_keyed = np.asarray(_ip_scores(jnp.asarray(data), c))
        posts = np.argsort(-d_keyed, axis=1)[:, :replicas]  # (N, R)
    else:
        posts = assigns[:, None]

    cov = 0.0
    for qi in range(NQ):
        pset = set(probe[qi].tolist())
        hit = sum(1 for r in gt[qi] if any(int(pc) in pset for pc in posts[r]))
        cov += hit / K
    cov /= NQ

    # cluster size stats
    counts = np.bincount(assigns, minlength=n_clusters)
    print(f"metric={metric} n={N} kc={n_clusters} nprobe={NPROBE} "
          f"coverage={cov:.3f} cluster_sizes min/med/max="
          f"{counts.min()}/{int(np.median(counts))}/{counts.max()} "
          f"empty={int((counts == 0).sum())}")
