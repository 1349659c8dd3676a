"""Upsert/churn bench (reference: benchmarks/upsert_bench.py): measures
overwrite throughput, delete/restore latency, and post-churn search latency.

    python benchmarks/upsert_bench.py [--n 200000] [--dim 128]
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
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--churn", type=float, default=0.1)
    args = ap.parse_args()

    import lynsedb_tpu as lynse

    rng = np.random.default_rng(0)
    data = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    with tempfile.TemporaryDirectory(dir=_SCRATCH) as tmp:
        client = lynse.VectorDBClient(tmp)
        db = client.create_database("bench", drop_if_exists=True)
        coll = db.require_collection("u", dim=args.dim)
        coll.add(list(range(args.n)), vectors=data, batch_size=100_000)
        coll.commit()

        m = int(args.n * args.churn)
        ids = rng.choice(args.n, size=m, replace=False)
        fresh = rng.normal(size=(m, args.dim)).astype(np.float32)

        t0 = time.perf_counter()
        coll.upsert([int(i) for i in ids], vectors=fresh)
        coll.commit()
        upsert_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        coll.delete([int(i) for i in ids[: m // 2]])
        coll.commit()
        delete_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        coll.restore([int(i) for i in ids[: m // 4]])
        coll.commit()
        restore_s = time.perf_counter() - t0

        q = data[:20]
        coll.search(q[0], k=10)  # warm
        t0 = time.perf_counter()
        res = coll.search_stream(q, k=10, window=16)
        search_ms = (time.perf_counter() - t0) / len(q) * 1e3
        assert len(res) == len(q)

        print(json.dumps({
            "upsert_vec_s": round(m / upsert_s),
            "delete_ids_s": round((m // 2) / delete_s),
            "restore_ids_s": round((m // 4) / restore_s),
            "post_churn_search_ms": round(search_ms, 3),
        }))
        client.close()


if __name__ == "__main__":
    main()
