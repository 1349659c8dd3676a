"""DiskANN build/search scale bench (reference:
benchmarks/diskann_scale_bench.py): Vamana build time, beam-search latency,
and recall across corpus sizes, plus in-place update throughput.

    python benchmarks/diskann_scale_bench.py [--sizes 50000 200000] [--dim 128]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
import tempfile
# bench scratch space: avoid /tmp (measured 14 MB/s on some hosts vs 2 GB/s
# on the repo filesystem) unless BENCH_TMPDIR says otherwise
# bench scratch dir passed per-call (dir=_SCRATCH): avoid /tmp (measured
# 14 MB/s on some hosts vs 2 GB/s on the repo filesystem) without mutating
# process-global tempfile state at import time
_SCRATCH = __import__("os").environ.get(
    "BENCH_TMPDIR", str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[50_000, 200_000])
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import lynsedb_tpu as lynse

    rng = np.random.default_rng(0)
    for n in args.sizes:
        data = rng.normal(size=(n, args.dim)).astype(np.float32)
        queries = rng.normal(size=(args.queries, args.dim)).astype(np.float32)
        with tempfile.TemporaryDirectory(dir=_SCRATCH) as tmp:
            client = lynse.VectorDBClient(tmp)
            db = client.create_database("bench", drop_if_exists=True)
            coll = db.require_collection("d", dim=args.dim, default_index=None)
            coll.add(list(range(n)), vectors=data, batch_size=100_000)
            coll.commit()

            t0 = time.perf_counter()
            coll.build_index("DISKANN-L2", r=16, l=64)
            build_s = time.perf_counter() - t0

            d2 = ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1) \
                if n <= 100_000 else None
            coll.search(queries[0], k=args.k, nprobe=100)  # warm
            hits, t0 = 0, time.perf_counter()
            for i in range(args.queries):
                res = coll.search(queries[i], k=args.k, nprobe=100)  # beam width per the recall gates
                if d2 is not None:
                    want = set(np.argsort(d2[i])[: args.k].tolist())
                    hits += len(set(int(x) for x in res.ids) & want)
            search_ms = (time.perf_counter() - t0) / args.queries * 1e3

            # in-place insert throughput (5% new rows, one commit)
            m = n // 20
            fresh = rng.normal(size=(m, args.dim)).astype(np.float32)
            coll.add(list(range(n, n + m)), vectors=fresh)
            t0 = time.perf_counter()
            coll.commit()  # triggers incremental linking
            insert_s = time.perf_counter() - t0

            print(json.dumps({
                "n": n,
                "build_s": round(build_s, 1),
                "search_ms": round(search_ms, 3),
                "recall": round(hits / (args.queries * args.k), 4) if d2 is not None else None,
                "inplace_insert_vec_s": round(m / insert_s),
            }), flush=True)
            client.close()


if __name__ == "__main__":
    main()
