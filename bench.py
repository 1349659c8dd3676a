"""Headline benchmark: 1M x 128-d f32 exact FLAT-IP search, k=10.

Mirrors the reference's committed benchmark config
(docs/comparisons/vector_database_benchmarks.md: 1M vector search mean
6.013 ms / 166 QPS / recall@10 1.0000 on CPU — see BASELINE.md). Runs the
full client path (filter resolution, device scan, id mapping, ResultView).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
where vs_baseline is the speedup ratio over the reference's 6.013 ms.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

BASELINE_SEARCH_MS = 6.013  # reference 1M x 128 FLAT-IP mean (BASELINE.md)

N = int(os.environ.get("BENCH_N", 1_000_000))
D = int(os.environ.get("BENCH_D", 128))
K = 10
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 100))
INGEST_BATCH = 100_000


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import lynsedb_tpu as lynse

    rng = np.random.default_rng(0)
    queries = rng.normal(size=(N_QUERIES, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    with tempfile.TemporaryDirectory() as tmp:
        client = lynse.VectorDBClient(os.path.join(tmp, "bench_root"))
        db = client.create_database("bench", drop_if_exists=True)
        coll = db.require_collection("v", dim=D, drop_if_exists=True)

        # ── ingest (streaming exact ground truth for 5 queries is computed
        #    outside the timed section — it's benchmark bookkeeping) ───────
        gt_q = queries[:5]
        gt_scores = np.full((5, K), -np.inf, dtype=np.float32)
        gt_ids = np.full((5, K), -1, dtype=np.int64)
        ingest_s = 0.0
        for start in range(0, N, INGEST_BATCH):
            m = min(INGEST_BATCH, N - start)
            chunk = rng.normal(size=(m, D)).astype(np.float32)
            chunk /= np.linalg.norm(chunk, axis=1, keepdims=True)
            s = gt_q @ chunk.T  # (5, m) numpy f32 ground truth
            merged = np.concatenate([gt_scores, s], axis=1)
            merged_ids = np.concatenate(
                [gt_ids, np.broadcast_to(np.arange(start, start + m), (5, m))], axis=1
            )
            top = np.argsort(-merged, axis=1)[:, :K]
            gt_scores = np.take_along_axis(merged, top, axis=1)
            gt_ids = np.take_along_axis(merged_ids, top, axis=1)
            t0 = time.perf_counter()
            coll.add(list(range(start, start + m)), vectors=chunk, batch_size=INGEST_BATCH)
            ingest_s += time.perf_counter() - t0
        t0 = time.perf_counter()
        coll.commit()
        ingest_s += time.perf_counter() - t0
        log(f"ingest: {N} x {D} in {ingest_s:.2f}s = {N / ingest_s:,.0f} vec/s")

        # ── warm up (device staging + compile) ────────────────────────────
        t0 = time.perf_counter()
        coll.search(queries[0], k=K)
        log(f"warm-up (stage+compile): {time.perf_counter() - t0:.2f}s")

        # ── recall@10 vs exact numpy ground truth ─────────────────────────
        hits = 0
        for i in range(5):
            res = coll.search(gt_q[i], k=K)
            hits += len(set(int(x) for x in res.ids.tolist()) & set(gt_ids[i].tolist()))
        recall = hits / (5 * K)
        log(f"recall@10 vs exact ground truth: {recall:.4f}")

        # ── single-query latency, sequential (includes one host sync per
        #    query — on a tunneled dev TPU the transport round trip
        #    dominates; on directly-attached hardware this approaches the
        #    pipelined number) ───────────────────────────────────────────
        times = []
        for i in range(N_QUERIES):
            t0 = time.perf_counter()
            coll.search(queries[i], k=K)
            times.append(time.perf_counter() - t0)
        times = np.array(times) * 1e3
        seq_ms = float(times.mean())
        p50, p95 = float(np.percentile(times, 50)), float(np.percentile(times, 95))
        log(
            f"sequential search: mean {seq_ms:.3f} ms | p50 {p50:.3f} | "
            f"p95 {p95:.3f} | QPS {1e3 / seq_ms:,.0f}"
        )

        # ── pipelined single-query stream (headline): queries micro-batched
        #    into windows, up to two windows in flight ──────────────────────
        coll.search_stream(queries[:16], k=K, window=16)  # warm window shape
        t0 = time.perf_counter()
        results = coll.search_stream(queries, k=K, window=16)
        stream_s = time.perf_counter() - t0
        assert len(results) == N_QUERIES
        mean_ms = stream_s / N_QUERIES * 1e3
        log(
            f"pipelined search (window=16): mean {mean_ms:.3f} ms/query | "
            f"QPS {1e3 / mean_ms:,.0f}"
        )

        # ── batched throughput (amortized HBM reads; fresh queries per rep
        #    so transport-level memoization can't flatter the numbers) ─────
        for batch in (16, 64):
            coll.batch_search(queries[:batch], k=K)  # compile
            reps = 5
            qsets = [
                rng.normal(size=(batch, D)).astype(np.float32) for _ in range(reps)
            ]
            t0 = time.perf_counter()
            for r in range(reps):
                coll.batch_search(qsets[r], k=K)
            dt = (time.perf_counter() - t0) / reps
            log(f"batch_search B={batch}: {dt * 1e3:.2f} ms/batch = {batch / dt:,.0f} QPS")

        # ── filtered search (10% bucket: gather-then-scan compact path) ──
        coll2 = db.require_collection("vf", dim=D, drop_if_exists=True)
        m = min(N, 100_000)
        chunk = rng.normal(size=(m, D)).astype(np.float32)
        coll2.add(list(range(m)), vectors=chunk,
                  fields=[{"bucket": i % 10} for i in range(m)])
        coll2.commit()
        coll2.search(queries[0], k=K, where="bucket = 3")
        t0 = time.perf_counter()
        for i in range(20):
            coll2.search(queries[i], k=K, where="bucket = 3")
        filt_ms = (time.perf_counter() - t0) / 20 * 1e3
        log(f"filtered search sequential (bucket=3): {filt_ms:.3f} ms")
        coll2.search_stream(queries[:16], k=K, where="bucket = 3", window=16)
        t0 = time.perf_counter()
        coll2.search_stream(queries[:96], k=K, where="bucket = 3", window=16)
        filt_stream_ms = (time.perf_counter() - t0) / 96 * 1e3
        log(f"filtered search pipelined (bucket=3): {filt_stream_ms:.3f} ms/query")

        client.close()

    print(
        json.dumps(
            {
                "metric": "flat_ip_1m_128_search_latency_pipelined",
                "value": round(mean_ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_SEARCH_MS / mean_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
