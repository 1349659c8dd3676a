"""Recall-floor gate across index modes (reference:
benchmarks/gate_index_modes.py — floors: exact flat 0.999, SQ8 0.95,
PQ/RaBitQ/PolarVec 0.70, HNSW/DiskANN 0.90, IVF/SPANN 0.85 :259-273).

Usage:
    python benchmarks/gate_index_modes.py [--n 100000] [--dim 128] [--queries 50]
    python benchmarks/gate_index_modes.py --sift path/to/sift  # uses SIFT files

Prints one line per mode with PASS/FAIL and exits nonzero on any failure.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import argparse
import json
import sys
import tempfile
# bench scratch dir passed per-call (dir=_SCRATCH): avoid /tmp (measured
# 14 MB/s on some hosts vs 2 GB/s on the repo filesystem) without mutating
# process-global tempfile state at import time
_SCRATCH = __import__("os").environ.get(
    "BENCH_TMPDIR", str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import time
from pathlib import Path

import numpy as np

GATES = [
    # (mode, recall floor, search kwargs, build kwargs)
    ("FLAT-IP", 0.999, {}, {}),
    ("FLAT-L2", 0.999, {}, {}),
    ("FLAT-COS", 0.999, {}, {}),
    ("FLAT-IP-SQ8", 0.95, {}, {}),
    ("FLAT-L2-SQ8", 0.95, {}, {}),
    ("FLAT-IP-PQ", 0.70, {}, {}),
    ("FLAT-IP-RABITQ", 0.70, {}, {}),
    ("FLAT-IP-POLARVEC", 0.70, {}, {}),
    # n_clusters None -> sqrt(n) at runtime (reference gate sizing:
    # benchmarks/gate_index_modes.py:255 n_clusters_for = clamp(sqrt(n), 64, 1024))
    ("IVF-IP", 0.85, {"nprobe": 32}, {"n_clusters": None}),
    ("IVF-L2", 0.85, {"nprobe": 32}, {"n_clusters": None}),
    ("SPANN-L2", 0.85, {"nprobe": 32}, {"n_clusters": None, "replica_count": 2}),
    ("HNSW-L2", 0.90, {"nprobe": 100}, {}),
    ("HNSW-IP", 0.90, {"nprobe": 100}, {}),
    ("DISKANN-L2", 0.90, {"nprobe": 100}, {}),
    ("DISKANN-IP", 0.90, {"nprobe": 100}, {}),
]


def ground_truth(data: np.ndarray, queries: np.ndarray, mode: str, k: int) -> np.ndarray:
    from lynsedb_tpu.metrics import Metric

    metric = Metric.from_index_mode(mode)
    if metric is Metric.IP:
        scores = queries @ data.T
        return np.argsort(-scores, axis=1)[:, :k]
    if metric is Metric.COSINE:
        dn = data / np.maximum(np.linalg.norm(data, axis=1, keepdims=True), 1e-30)
        qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
        return np.argsort(-(qn @ dn.T), axis=1)[:, :k]
    d2 = (
        (queries**2).sum(1)[:, None]
        + (data**2).sum(1)[None, :]
        - 2.0 * queries @ data.T
    )
    return np.argsort(d2, axis=1)[:, :k]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sift", help="dir with sift_base.fvecs/sift_query.fvecs")
    ap.add_argument("--modes", nargs="*", help="subset of modes to gate")
    args = ap.parse_args()

    import jax  # after lynse pins/resolves the platform; used to tag rows
    import lynsedb_tpu as lynse

    rng = np.random.default_rng(0)
    if args.sift:
        from sift_io import read_fvecs

        data = read_fvecs(str(Path(args.sift) / "sift_base.fvecs"), limit=args.n)
        queries = read_fvecs(str(Path(args.sift) / "sift_query.fvecs"), limit=args.queries)
    else:
        # uniform [0,1) matches the reference's gate data distribution
        # (reference: benchmarks/gate_matrix_bench.py:142 make_dense uses
        # rng.random) — the recall floors were calibrated on it
        data = rng.random(size=(args.n, args.dim), dtype=np.float32)
        queries = rng.random(size=(args.queries, args.dim), dtype=np.float32)

    gates = GATES if not args.modes else [g for g in GATES if g[0] in set(args.modes)]
    failures = []
    with tempfile.TemporaryDirectory(dir=_SCRATCH) as tmp:
        client = lynse.VectorDBClient(tmp)
        db = client.create_database("gate", drop_if_exists=True)
        base = db.require_collection("base", dim=data.shape[1], default_index=None)
        base.add(list(range(len(data))), vectors=data, batch_size=100_000)
        base.commit()

        for mode, floor, skw, bkw in gates:
            bkw = dict(bkw)
            if "n_clusters" in bkw and bkw["n_clusters"] is None:
                bkw["n_clusters"] = max(64, min(1024, int(len(data) ** 0.5)))
            t0 = time.perf_counter()
            base.build_index(mode, **bkw)
            build_s = time.perf_counter() - t0
            want = ground_truth(data, queries, mode, args.k)
            # warm query outside the timed loop: through the dev tunnel the
            # first search absorbs the server-side executable compile
            # (45-200 s), which otherwise lands in the first mode's search_ms
            base.search(queries[0], k=args.k, **skw)
            total = 0.0
            t0 = time.perf_counter()
            for i in range(len(queries)):
                res = base.search(queries[i], k=args.k, **skw)
                got = set(int(x) for x in res.ids.tolist())
                total += len(got & set(want[i].tolist())) / args.k
            search_ms = (time.perf_counter() - t0) / len(queries) * 1e3
            recall = total / len(queries)
            # reference semantics (scripts/perf_gate_local.py:508 builds the
            # recall case with warning=True when recall < floor, and :538
            # treats warning as FAIL for every mode): sub-floor recall is a
            # hard failure on ALL modes, approximate included
            status = "PASS" if recall >= floor else "FAIL"
            print(
                json.dumps(
                    {
                        "mode": mode,
                        "recall": round(recall, 4),
                        "floor": floor,
                        "status": status,
                        "build_s": round(build_s, 2),
                        "search_ms": round(search_ms, 3),
                        # recall is backend-independent; timings are not —
                        # label which backend produced this row
                        "platform": jax.default_backend(),
                    }
                ),
                flush=True,
            )
            if status == "FAIL":
                failures.append(mode)
        client.close()
    if failures:
        print(f"GATE FAILURES: {failures}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
