"""A/B: HNSW-IP recall at 200k SIFT-shaped vs ef_construction, through the
real index path (upper-layer descent entries + bf16-guided beam + exact
rescore) — the same path the 1M gate exercises.

The round-4 1M gate recorded HNSW-IP 0.89 vs the 0.90 floor while
DiskANN-IP (same construction code, candidate list l=100 instead of
HNSW's efc//2=64) gated 0.954. This probe isolates the candidate-list
width before re-burning a 1M build.

Usage: python scripts/hnsw_ip_lbuild_probe.py [n]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
NQ, K = 100, 10


def main():
    import tempfile

    from sift_io import read_fvecs

    import lynsedb_tpu as lynse

    root = Path(__file__).resolve().parent.parent
    base = read_fvecs(str(root / "benchmarks/data/synth_sift_1m/sift_base.fvecs"), limit=N)
    queries = read_fvecs(str(root / "benchmarks/data/synth_sift_1m/sift_query.fvecs"), limit=NQ)
    gt = np.argsort(-(queries @ base.T), axis=1)[:, :K]

    for efc in (128, 200, 256):
        with tempfile.TemporaryDirectory(dir=str(root)) as tmp:
            client = lynse.VectorDBClient(tmp)
            db = client.create_database("probe", drop_if_exists=True)
            coll = db.require_collection("c", dim=128, default_index=None)
            coll.add(list(range(N)), vectors=base, batch_size=100_000)
            coll.commit()
            t0 = time.perf_counter()
            coll.build_index("HNSW-IP", ef_construction=efc)
            build_s = time.perf_counter() - t0
            for ef in (50, 100):
                total = 0.0
                for i in range(NQ):
                    res = coll.search(queries[i], k=K, nprobe=ef)
                    got = set(int(x) for x in res.ids.tolist())
                    total += len(got & set(gt[i].tolist())) / K
                print(f"efc={efc} ef={ef}: recall@10={total/NQ:.3f} "
                      f"(build {build_s:.0f}s)", flush=True)
            client.close()


if __name__ == "__main__":
    main()
