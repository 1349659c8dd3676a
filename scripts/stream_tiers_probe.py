"""Focused >HBM streaming-tier legs (no DiskANN build):

  1. 1000-query stream amortization — the blockwise pass pumps the corpus
     over the transport ONCE per pass, so ms/q scales ~1/stream_len down
     to the pump floor (dev tunnel: ~20-47 MB/s blocked H2D,
     benchmarks/dispatch_floor_r05.log h2d bandwidth rows).
  2. FLAT-IP-SQ8 aux tier — the 4x-smaller int8 codes stay device-resident
     while the raw corpus exceeds the HBM budget; searches run a resident
     code scan + host-mirror exact rescore instead of pumping.

Same forced 128 MB budget + SIFT-shaped 1M corpus as
scripts/streaming_scan_probe.py (which carries the full tier matrix).

Usage: python scripts/stream_tiers_probe.py [n]
"""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("LYNSE_TPU_HBM_BYTES", str(128 * 1024 * 1024))
os.environ["LYNSE_SEARCH_CACHE_SIZE"] = "0"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ, K = 100, 10


def main():
    from sift_io import read_fvecs

    import lynsedb_tpu as lynse

    base = read_fvecs(str(ROOT / "benchmarks/data/synth_sift_1m/sift_base.fvecs"), limit=N)
    queries = read_fvecs(str(ROOT / "benchmarks/data/synth_sift_1m/sift_query.fvecs"), limit=NQ)
    gt = np.argsort(-(queries @ base.T), axis=1)[:, :K]

    import tempfile
    with tempfile.TemporaryDirectory(dir=str(ROOT)) as tmp:
        client = lynse.VectorDBClient(tmp)
        db = client.create_database("stream", drop_if_exists=True)
        coll = db.require_collection("c", dim=base.shape[1], default_index="FLAT-IP")
        t0 = time.perf_counter()
        for lo in range(0, N, 100_000):
            hi = min(lo + 100_000, N)
            coll.add(list(range(lo, hi)), vectors=base[lo:hi])
        coll.commit()
        print(f"ingest {time.perf_counter()-t0:.0f}s", flush=True)
        coll.search(queries[0], k=K)  # warm/compile
        corpus = coll._engine.corpus()
        assert corpus.streaming, "corpus did not enter streaming mode"

        rng = np.random.default_rng(11)
        q1k = np.concatenate(
            [queries, rng.normal(queries.mean(), queries.std(),
                                 size=(1000 - NQ, queries.shape[1])
                                 ).astype(np.float32)])
        outs = coll.search_stream(q1k, k=K)  # warm the chunk shapes
        t0 = time.perf_counter()
        outs = coll.search_stream(q1k, k=K)
        amort_s = time.perf_counter() - t0
        hits = 0
        for i in range(NQ):  # recall on the real query prefix
            got = set(int(x) for x in np.asarray(outs[i].ids).tolist())
            hits += len(got & set(gt[i].tolist()))
        print(f"FLAT streaming 1000-query stream: recall@10={hits/(NQ*K):.4f} "
              f"{amort_s/1000*1e3:.2f} ms/q ({amort_s:.1f}s total)", flush=True)

        t0 = time.perf_counter()
        coll.build_index("FLAT-IP-SQ8")
        print(f"sq8 build {time.perf_counter()-t0:.0f}s", flush=True)
        coll.batch_search(queries, K)  # warm
        hits, q_s = 0, float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            res = coll.batch_search(queries, K)
            q_s = min(q_s, time.perf_counter() - t0)
        for i in range(NQ):
            got = set(int(x) for x in np.asarray(res[i].ids).tolist())
            hits += len(got & set(gt[i].tolist()))
        print(f"FLAT-IP-SQ8 on streaming corpus (resident codes): "
              f"recall@10={hits/(NQ*K):.4f} batch{NQ} {q_s/NQ*1e3:.2f} ms/q",
              flush=True)
        client.close()


if __name__ == "__main__":
    main()
