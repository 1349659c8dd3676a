"""DiskANN batch-QPS scaling on the saved 1M raw-IP index.

The graph beam is a lockstep while_loop (~2*beam steps); per-step cost is
dispatch/gather-dominated at small batches, so QPS should scale strongly
with B on TPU — each step's neighbor gather+score grows to MXU-useful
sizes. Measures batch {64, 256, 1024} with distinct per-rep query sets
(cache-proof) on the production search path.

Usage: python scripts/diskann_batch_qps_probe.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
PERSIST = ROOT / "benchmarks" / "data" / "diskann_1m_raw_diag"
NQ, K = 1024, 10


def main():
    from sift_io import read_fvecs

    import lynsedb_tpu as lynse

    queries = read_fvecs(str(ROOT / "benchmarks/data/synth_sift_1m/sift_query.fvecs"),
                         limit=NQ)
    if len(queries) < NQ:  # tile up if the query file is short
        reps = (NQ + len(queries) - 1) // len(queries)
        queries = np.concatenate([queries + np.float32(i * 1e-3)
                                  for i in range(reps)])[:NQ]
    gt = np.load(PERSIST / "gt_ip_raw.npy")
    client = lynse.VectorDBClient(str(PERSIST / "db"))
    coll = client.get_database("diag").get_collection("c")
    coll._engine._search_cache.max_size = 0

    from lynsedb_tpu.ops import graph as G

    # (batch, expand) grid: expand>1 cuts the lockstep step count ~E x at
    # some recall cost (graph.py BEAM_EXPAND); the beam wrappers resolve
    # the module global per call, so sweeping it in-process is sound.
    # Expand swept only at B=256 to bound tunnel compile count.
    for b, expand in ((64, 1), (256, 1), (256, 2), (256, 4), (1024, 1)):
        G.BEAM_EXPAND = expand
        qs = queries[:b]
        res = coll.batch_search(qs, K, nprobe=100)  # warm/compile this (B,E)
        hits = 0
        ngt = min(b, len(gt))
        for i in range(ngt):
            got = {int(x) for x in np.asarray(res[i].ids).tolist()}
            hits += len(got & set(gt[i].tolist()))
        reps = 3
        sets = [qs + np.float32(1e-3 * (r + 7)) for r in range(reps)]
        t0 = time.perf_counter()
        for r in range(reps):
            coll.batch_search(sets[r], K, nprobe=100)
        qps = b / ((time.perf_counter() - t0) / reps)
        print(f"B={b} expand={expand}: recall@10={hits/(ngt*K):.3f}  "
              f"{qps:,.0f} QPS ({1e3/qps:.2f} ms/q)", flush=True)
    client.close()


if __name__ == "__main__":
    main()
