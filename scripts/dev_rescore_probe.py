"""Time the fused device-rescore search path on hardware at 1M x 128.

Measures, for FLAT-IP with the packed (B, 3k) fetch (ops/scan.py
bf16_exact_pass_packed) vs the prior (B, C) shortlist fetch + host rescore:
  - B=256 batch: sequential (submit+resolve) and pipelined (8 in flight)
  - B=1 sequential latency (the dispatch-floor-bound number)
  - single-query pipelined stream via DeviceCorpus.stream_submit

One leg per invocation (each leg costs one server-side compile through the
dev tunnel, 45-600 s; the executable cache carries completed legs):

  timeout 1500 python scripts/dev_rescore_probe.py b256    # batch path
  timeout 1500 python scripts/dev_rescore_probe.py b1      # B=1 sequential
  timeout 1500 python scripts/dev_rescore_probe.py stream  # pipelined window
  timeout 1500 python scripts/dev_rescore_probe.py host    # old path A/B
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import lynsedb_tpu.ops.scan as S
from lynsedb_tpu.metrics import Metric

N, D, K = 1_000_000, 128, 10
metric = Metric.IP
LEG = sys.argv[1] if len(sys.argv) > 1 else "b256"


def build():
    import jax
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(7)
    corpus = S.DeviceCorpus(dim=D)
    for lo in range(0, N, 250_000):
        corpus.append(rng.standard_normal((250_000, D)).astype(np.float32))
    return corpus, rng


def time_batch(corpus, q, label):
    reps = 5
    t0 = time.perf_counter()
    for r in range(reps):
        corpus.search(q + np.float32(r), K, metric)
    seq = (time.perf_counter() - t0) / reps * 1e3
    t0 = time.perf_counter()
    resolvers = [corpus.search_submit(q + np.float32(r), K, metric) for r in range(8)]
    _ = [r() for r in resolvers]
    pipe = (time.perf_counter() - t0) / 8 * 1e3
    print(f"{label:12s} B=256: seq {seq:8.2f} ms/batch ({256/seq*1e3:7,.0f} QPS) | "
          f"pipelined {pipe:8.2f} ms/batch ({256/pipe*1e3:7,.0f} QPS)", flush=True)


def main():
    corpus, rng = build()
    q = rng.standard_normal((256, D)).astype(np.float32)

    if LEG in ("b256", "host"):
        S.DEVICE_RESCORE = LEG == "b256"
        label = "dev-rescore" if S.DEVICE_RESCORE else "host-rescore"
        t0 = time.perf_counter()
        corpus.search(q, K, metric)  # stage + compile B=256
        print(f"warm B=256 {label} (stage+compile): "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        time_batch(corpus, q, label)
    elif LEG == "b1":
        q1 = q[:1]
        t0 = time.perf_counter()
        corpus.search(q1, K, metric)  # stage + compile bucket-16
        print(f"warm B=1 (stage+compile): {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for r in range(10):
            corpus.search(q1 + np.float32(r), K, metric)
        print(f"dev-rescore  B=1 sequential: "
              f"{(time.perf_counter() - t0) / 10 * 1e3:.2f} ms", flush=True)
    elif LEG == "stream":
        W, NQ = 64, 1024
        qs = rng.standard_normal((NQ, D)).astype(np.float32)
        qd = corpus.stream_stage_queries(qs)
        t0 = time.perf_counter()
        corpus.stream_submit(qd, 0, W, K, metric)(qs[:W])  # stage + compile
        print(f"warm stream W={W} (stage+compile): "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        rs = [corpus.stream_submit(qd, s, W, K, metric) for s in range(0, NQ, W)]
        for s, r in zip(range(0, NQ, W), rs):
            r(qs[s : s + W])
        ms_q = (time.perf_counter() - t0) / NQ * 1e3
        print(f"dev-rescore  stream W={W}: {ms_q:.3f} ms/query "
              f"({1e3/ms_q:,.0f} QPS)", flush=True)
    else:
        raise SystemExit(f"unknown leg {LEG!r} (b256|host|b1|stream)")


if __name__ == "__main__":
    main()
