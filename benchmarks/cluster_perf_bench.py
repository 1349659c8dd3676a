"""Cluster perf bench (reference: benchmarks/cluster_perf_bench.py):
in-process coordinator + N shard servers on localhost; measures fan-out
search latency over the RPC plane vs direct single-shard latency.

    python benchmarks/cluster_perf_bench.py [--shards 3] [--n 100000]
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
from pathlib import Path

import numpy as np
import requests


def post(url, endpoint, payload):
    r = requests.post(url + endpoint, json=payload, timeout=120)
    assert r.status_code == 200, (endpoint, r.text[:200])
    return r.json().get("params") or {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=3)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=50)
    args = ap.parse_args()

    from lynsedb_tpu.cluster.coordinator import BackgroundCoordinator
    from lynsedb_tpu.server.app import BackgroundServer

    rng = np.random.default_rng(0)
    data = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    queries = rng.normal(size=(args.queries, args.dim)).astype(np.float32)

    with tempfile.TemporaryDirectory(dir=_SCRATCH) as tmp:
        shards = [BackgroundServer(str(Path(tmp) / f"s{i}"), port=0) for i in range(args.shards)]
        config = {
            "bucket_count": 256,
            "metadata": {"kind": "local", "path": str(Path(tmp) / "meta.json")},
            "shard_groups": [
                {"name": f"g{i}", "primary": s.url, "replicas": []} for i, s in enumerate(shards)
            ],
        }
        coord = BackgroundCoordinator(config, port=0, health_loop=False)
        url = coord.url
        post(url, "/create_database", {"database_name": "b"})
        post(url, "/required_collection", {"database_name": "b", "collection_name": "c",
                                           "dim": args.dim})
        t0 = time.perf_counter()
        for s in range(0, args.n, 50_000):
            chunk = data[s : s + 50_000]
            post(url, "/add", {"database_name": "b", "collection_name": "c",
                               "ids": list(range(s, s + len(chunk))),
                               "vectors": chunk.tolist()})
        post(url, "/commit", {"database_name": "b", "collection_name": "c"})
        ingest_s = time.perf_counter() - t0

        body = {"database_name": "b", "collection_name": "c", "k": 10}
        post(url, "/search", {**body, "vector": queries[0].tolist()})  # warm
        t0 = time.perf_counter()
        for i in range(args.queries):
            post(url, "/search", {**body, "vector": queries[i].tolist()})
        coord_ms = (time.perf_counter() - t0) / args.queries * 1e3

        # single-shard direct for overhead comparison
        shard_url = shards[0].url
        post(shard_url, "/search", {**body, "vector": queries[0].tolist()})
        t0 = time.perf_counter()
        for i in range(args.queries):
            post(shard_url, "/search", {**body, "vector": queries[i].tolist()})
        shard_ms = (time.perf_counter() - t0) / args.queries * 1e3

        print(json.dumps({
            "shards": args.shards,
            "ingest_vec_s": round(args.n / ingest_s),
            "coordinator_search_ms": round(coord_ms, 3),
            "single_shard_search_ms": round(shard_ms, 3),
            "fanout_overhead_ms": round(coord_ms - shard_ms, 3),
        }))
        coord.stop()
        for s in shards:
            s.stop()


if __name__ == "__main__":
    main()
