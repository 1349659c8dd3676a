"""1M DiskANN-IP diagnosis: build once into a persistent dir, then separate
the recall loss into (a) PQ-guided walk error, (b) graph quality (exact
beam on the same graph), (c) entry coverage (bigger entry fan-out).

Usage:
  python scripts/diskann_1m_diag.py build   # ingest + build + save (~35 min)
  python scripts/diskann_1m_diag.py probe   # recall probes on the saved index
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
PERSIST = ROOT / "benchmarks" / "data" / "diskann_1m_diag"
N, NQ, K = 1_000_000, 100, 10


def load_data():
    from sift_io import read_fvecs

    base = read_fvecs(str(ROOT / "benchmarks/data/synth_sift_1m/sift_base.fvecs"), limit=N)
    queries = read_fvecs(str(ROOT / "benchmarks/data/synth_sift_1m/sift_query.fvecs"), limit=NQ)
    base /= np.maximum(np.linalg.norm(base, axis=1, keepdims=True), 1e-12)
    queries /= np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    return base, queries


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "probe"
    import lynsedb_tpu as lynse

    base, queries = load_data()
    gt_path = PERSIST / "gt_ip.npy"

    if stage == "build":
        client = lynse.VectorDBClient(str(PERSIST / "db"))
        db = client.create_database("diag", drop_if_exists=True)
        coll = db.require_collection("c", dim=128, default_index="FLAT-IP")
        t0 = time.perf_counter()
        for lo in range(0, N, 100_000):
            coll.add(list(range(lo, lo + 100_000)), vectors=base[lo:lo + 100_000])
        coll.commit()
        print(f"ingest {time.perf_counter()-t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        coll.build_index("DISKANN-IP", r=32, l=100)
        print(f"build {time.perf_counter()-t0:.0f}s", flush=True)
        client.close()
        from sift_bench import exact_gt
        t0 = time.perf_counter()
        gt = exact_gt(base, queries, "ip")
        np.save(gt_path, gt)
        print(f"gt {time.perf_counter()-t0:.0f}s", flush=True)
        return

    gt = np.load(gt_path)
    client = lynse.VectorDBClient(str(PERSIST / "db"))
    coll = client.get_database("diag").get_collection("c")
    eng = coll._engine
    eng._search_cache.max_size = 0  # identical probe queries must re-run
    idx = eng._index
    print(f"index: {type(idx).__name__} layered={idx.layered} r={idx.r} "
          f"built={idx.built_rows}", flush=True)

    def recall(skw):
        hits = 0
        res = coll.batch_search(queries, K, **skw)
        for i in range(NQ):
            got = set(int(x) for x in np.asarray(res[i].ids).tolist())
            hits += len(got & set(gt[i].tolist()))
        return hits / (NQ * K)

    for beam in (100, 150, 300):
        t0 = time.perf_counter()
        r = recall({"nprobe": beam})
        print(f"layered-pq beam={beam}: recall@10={r:.3f} "
              f"({(time.perf_counter()-t0)/NQ*1e3:.1f} ms/q)", flush=True)

    # (b) exact beam on the same graph — isolates PQ-guidance loss
    pq_codes = idx.pq_codes
    idx.pq_codes = None
    for beam in (100, 150):
        t0 = time.perf_counter()
        r = recall({"nprobe": beam})
        print(f"exact-beam beam={beam}: recall@10={r:.3f} "
              f"({(time.perf_counter()-t0)/NQ*1e3:.1f} ms/q)", flush=True)
    idx.pq_codes = pq_codes

    # (c) entry fan-out: more per-query entries
    for top in (32,):
        idx.ENTRY_TOP = top
        idx._entry_dev = None
        r = recall({"nprobe": 150})
        print(f"layered-pq beam=150 entry_top={top}: recall@10={r:.3f}", flush=True)

    client.close()


if __name__ == "__main__":
    main()
