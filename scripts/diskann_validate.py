"""Pre-1M validation: DiskANN graph quality on clustered SIFT-shaped data.

Builds Vamana at --n rows for IP and L2, measures recall@10 via the exact
beam kernel AND the PQ-guided layered path (what 1M search uses), and prints
build time so the 1M build cost can be extrapolated before committing ~5 h.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

import numpy as np
import jax.numpy as jnp

from sift_bench import synth_sift, exact_gt
from sift_io import read_fvecs
from lynsedb_tpu.metrics import Metric
from lynsedb_tpu.ops.graph import beam_search, beam_search_pq, build_vamana
from lynsedb_tpu.ops.quantize import PQ

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
R = int(sys.argv[2]) if len(sys.argv) > 2 else 16
L = int(sys.argv[3]) if len(sys.argv) > 3 else 64
NQ, K = 50, 10

tmp = synth_sift(N, NQ)
data = read_fvecs(str(Path(tmp) / "sift_base.fvecs"))
queries = read_fvecs(str(Path(tmp) / "sift_query.fvecs"))

for mname in ("ip", "l2"):
    metric = Metric.IP if mname == "ip" else Metric.L2
    gt = exact_gt(data, queries, mname)
    rows = jnp.asarray(data)
    t0 = time.perf_counter()
    graph = build_vamana(rows, metric, r=R, l_build=L)
    build_s = time.perf_counter() - t0
    medoid = int(np.argmin(((data - data.mean(0)) ** 2).sum(1)))
    starts = [medoid]
    if metric is Metric.IP:
        norms = np.linalg.norm(data, axis=1)
        starts.extend(np.argsort(-norms)[:4].tolist())
    starts = np.unique(np.asarray(starts, dtype=np.int32))
    valid = jnp.ones(N, dtype=bool)
    qj = jnp.asarray(queries)

    for beam in (100, 150):
        keys, ids, _ = beam_search(
            qj, rows.astype(jnp.float32), jnp.asarray(graph),
            jnp.asarray(starts), valid, metric=metric, beam=beam,
            max_steps=beam * 2, k=K)
        ids = np.asarray(ids)
        rec = np.mean([len(set(ids[i].tolist()) & set(gt[i].tolist())) / K
                       for i in range(NQ)])
        print(f"n={N} r={R} l={L} metric={mname} beam={beam} "
              f"EXACT recall@10={rec:.3f} build_s={build_s:.1f}", flush=True)

    # layered path: PQ-guided beam + exact rescore of the pool
    sample = data if len(data) <= 131072 else data[
        np.random.default_rng(7).choice(len(data), 131072, replace=False)]
    pq = PQ.fit(sample.astype(np.float32))
    codes = pq.encode(data.astype(np.float32))
    books_sq = (pq.codebooks ** 2).sum(axis=2)
    row_sq = np.take_along_axis(books_sq.T, codes.astype(np.int64), axis=0).sum(1).astype(np.float32)
    for beam in (100, 150):
        bpq = 2 * beam
        _, pool, _ = beam_search_pq(
            qj, jnp.asarray(codes), jnp.asarray(pq.codebooks),
            jnp.asarray(row_sq), jnp.asarray(graph), jnp.asarray(starts),
            valid, metric_kind=mname, beam=bpq, max_steps=bpq * 2)
        pool = np.asarray(pool)
        rec = 0.0
        for i in range(NQ):
            cand = pool[i][pool[i] >= 0]
            if mname == "ip":
                sc = queries[i] @ data[cand].T
                top = cand[np.argsort(-sc)[:K]]
            else:
                d2 = ((data[cand] - queries[i]) ** 2).sum(1)
                top = cand[np.argsort(d2)[:K]]
            rec += len(set(top.tolist()) & set(gt[i].tolist())) / K
        rec /= NQ
        print(f"n={N} r={R} l={L} metric={mname} beam={beam} "
              f"LAYERED-PQ recall@10={rec:.3f}", flush=True)
