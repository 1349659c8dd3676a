"""Hardware run of the >HBM blockwise streaming scan (VERDICT r3 weak #7).

Forces streaming mode by setting the HBM budget BELOW the 1M corpus bf16
footprint before importing the engine, then measures FLAT recall + latency
and (if the graph exists) DiskANN's PQ-guided streaming tier on the same
corpus as the gate matrix. Records the evidence the PARITY '>HBM closed'
claim needs (reference tier: flat_mmap.rs:89 mmap window scan).

Usage: python scripts/streaming_scan_probe.py [n]
"""
import os
import sys
import time
from pathlib import Path

# 1M x 128 bf16 = 256 MB; budget 128 MB forces the streaming tier with
# multiple blocks. Must be set before lynsedb_tpu import reads it.
os.environ.setdefault("LYNSE_TPU_HBM_BYTES", str(128 * 1024 * 1024))
# the probe re-asks the same 100 queries per tier; the result cache would
# serve tier N+1 from tier N's answers (r05 run: the PQ-beam row measured
# 0.02 ms/q — a cache hit, not the beam). Disable it for honest timings.
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
        coll.search(queries[0], k=K)  # warm/compile (stages the corpus)
        corpus = coll._engine.corpus()
        print(f"streaming={corpus.streaming} budget={os.environ['LYNSE_TPU_HBM_BYTES']}",
              flush=True)
        assert corpus.streaming, "corpus did not enter streaming mode"
        res = coll.batch_search(queries, K)  # warm the batch chunk shape
        hits = 0
        batch_s = float("inf")
        for _ in range(2):  # best-of-2: tunnel weather
            t0 = time.perf_counter()
            res = coll.batch_search(queries, K)
            batch_s = min(batch_s, time.perf_counter() - t0)
        for i in range(NQ):
            got = set(int(x) for x in np.asarray(res[i].ids).tolist())
            hits += len(got & set(gt[i].tolist()))
        print(f"FLAT streaming: recall@10={hits/(NQ*K):.4f} "
              f"batch{NQ} {batch_s/NQ*1e3:.2f} ms/q", flush=True)

        # pipelined stream axis over the streaming tier (shares one pump)
        coll.search_stream(queries, k=K)
        stream_s = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            coll.search_stream(queries, k=K)
            stream_s = min(stream_s, time.perf_counter() - t0)
        print(f"FLAT streaming pipelined: {stream_s/NQ*1e3:.2f} ms/q", flush=True)

        # amortization leg: the pass pumps the corpus over the transport
        # ONCE regardless of stream length (the pump is the floor — see
        # dispatch_floor h2d bandwidth rows), so ms/q scales ~1/stream_len
        rng = np.random.default_rng(11)
        q1k = np.concatenate(
            [queries, rng.normal(queries.mean(), queries.std(),
                                 size=(1000 - NQ, queries.shape[1])
                                 ).astype(np.float32)])
        outs = coll.search_stream(q1k, k=K)  # warm the wider chunk count
        t0 = time.perf_counter()
        outs = coll.search_stream(q1k, k=K)
        amort_s = time.perf_counter() - t0
        hits = 0
        for i in range(NQ):  # recall on the real query prefix
            got = set(int(x) for x in np.asarray(outs[i].ids).tolist())
            hits += len(got & set(gt[i].tolist()))
        print(f"FLAT streaming 1000-query stream: recall@10={hits/(NQ*K):.4f} "
              f"{amort_s/1000*1e3:.2f} ms/q ({amort_s:.1f}s total)", flush=True)

        # quantized tier on the streaming corpus: SQ8 codes (4x smaller)
        # stay DEVICE-RESIDENT while the raw corpus exceeds HBM — searches
        # run a resident int8 code scan + host-mirror exact rescore instead
        # of pumping the corpus (reference tiering: pq_mmap.rs shortlist
        # over mmap'd raw vectors)
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

        # DiskANN streaming tiers: SQ8-guided (middle) and PQ-guided
        # (deepest) beam + host-mirror rescore, same graph
        t0 = time.perf_counter()
        coll.build_index("DISKANN-IP", r=32, l=100)
        print(f"diskann build {time.perf_counter()-t0:.0f}s", flush=True)
        idx = coll._engine._index
        for tier, hook in (("SQ8 beam", "_force_sq8"), ("PQ beam", "_force_pq")):
            idx._force_sq8 = idx._force_pq = False
            setattr(idx, hook, True)
            coll.search(queries[0], k=K, nprobe=100)  # warm this tier
            hits = 0
            t0 = time.perf_counter()
            res = coll.batch_search(queries, K, nprobe=100)
            d_s = time.perf_counter() - t0
            for i in range(NQ):
                got = set(int(x) for x in np.asarray(res[i].ids).tolist())
                hits += len(got & set(gt[i].tolist()))
            print(f"DISKANN-IP streaming({tier}): recall@10={hits/(NQ*K):.4f} "
                  f"batch{NQ} {d_s/NQ*1e3:.2f} ms/q", flush=True)
        client.close()


if __name__ == "__main__":
    main()
