"""1M raw-MIPS DiskANN diagnosis: the gate's exact configuration
(unnormalized synth-SIFT corpus, DISKANN-IP), built once into a persistent
dir, then search-side lever sweeps (beam width, entry fan-out, step budget)
with 100 queries.

The round-4 gate recorded DISKANN-IP 0.89 vs the 0.90 floor on raw data
(20 queries), while the normalized north-star config measures 0.954
(scripts/diskann_1m_diag.py). This isolates whether the raw-MIPS deficit is
recoverable search-side before touching construction.

Usage:
  python scripts/diskann_1m_raw_diag.py build
  python scripts/diskann_1m_raw_diag.py probe
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
PERSIST = ROOT / "benchmarks" / "data" / "diskann_1m_raw_diag"
N, NQ, K = 1_000_000, 100, 10


def load_data():
    from sift_io import read_fvecs

    base = read_fvecs(str(ROOT / "benchmarks/data/synth_sift_1m/sift_base.fvecs"), limit=N)
    queries = read_fvecs(str(ROOT / "benchmarks/data/synth_sift_1m/sift_query.fvecs"), limit=NQ)
    return base, queries


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "probe"
    import lynsedb_tpu as lynse

    base, queries = load_data()
    gt_path = PERSIST / "gt_ip_raw.npy"

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
    eng._search_cache.max_size = 0
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

    for beam in (100, 128, 150, 200, 300):
        t0 = time.perf_counter()
        r = recall({"nprobe": beam})
        print(f"bf16-beam beam={beam}: recall@10={r:.3f} "
              f"({(time.perf_counter()-t0)/NQ*1e3:.1f} ms/q)", flush=True)

    for top in (16, 32):
        idx.ENTRY_TOP = top
        idx._entry_dev = None
        r = recall({"nprobe": 100})
        print(f"bf16-beam beam=100 entry_top={top}: recall@10={r:.3f}", flush=True)
    idx.ENTRY_TOP = 8
    idx._entry_dev = None

    # bigger entry-scan sample: 4096 of 1M is 0.4% coverage; a 4x sample is
    # still a tiny matmul but may seed the beam inside the right norm band
    for samp in (16384,):
        idx.ENTRY_SAMPLE = samp
        idx._entry_dev = None
        r = recall({"nprobe": 100})
        print(f"bf16-beam beam=100 entry_sample={samp}: recall@10={r:.3f}", flush=True)
    idx.ENTRY_SAMPLE = 4096
    idx._entry_dev = None

    # step budget: does the walk exhaust max_steps (frontier starvation) or
    # converge early? max_steps rides beam via beam*2 — probe an extended
    # walk at the gate beam by oversizing nprobe only for steps
    client.close()


if __name__ == "__main__":
    main()
