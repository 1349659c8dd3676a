"""Bisect the pipelined-stream window cost at 1M x 128 into transport legs.

The headline bench metric (flat_ip_1m_128_search_latency_pipelined) is a
100-query stream served by ONE 128-wide window: one H2D query stage, one
fused scan dispatch, one D2H id fetch, one host rescore. Its wall time is
therefore a handful of tunnel round trips (~33 ms each,
benchmarks/dispatch_floor_r05.log) divided by 100 — engine time is ~2 ms.
This probe times each leg separately so round-over-round movement in the
headline can be attributed to transport weather vs engine changes, and
A/Bs window shapes / in-flight depth to find the chain-minimal stream.

Legs:
  floor   — empty-kernel dispatch + fetch (the tunnel RTT floor)
  h2d     — device_put of the (128, D) query block, blocked
  window  — stage + stream_submit + resolve: the production window chain
  nostage — search_submit(q) letting the dispatch carry the H2D itself
  depth2  — two 64-wide windows, 2 in flight (does splitting ever win?)

Usage: python scripts/stream_leg_probe.py [N] [REPS]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
D = 128
K = 10
NQ = 100


def _time(fn, reps=REPS):
    fn()  # warm (compile / first-call artifact)
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lynsedb_tpu.metrics import Metric
    from lynsedb_tpu.ops.scan import DeviceCorpus

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    corpus = DeviceCorpus(D)
    for s in range(0, N, 250_000):
        m = min(250_000, N - s)
        corpus.append(rng.normal(size=(m, D)).astype(np.float32))
    t0 = time.perf_counter()
    corpus._ensure_staged()
    print(f"staged {N}x{D} to device in {time.perf_counter() - t0:.2f}s", flush=True)

    q = rng.normal(size=(NQ, D)).astype(np.float32)
    q128 = np.concatenate([q, np.zeros((128 - NQ, D), np.float32)])

    # floor: empty-ish dispatch + fetch
    base = jax.device_put(np.zeros(8, np.float32))
    add1 = jax.jit(lambda x: x + 1.0)
    ms = _time(lambda: np.asarray(add1(base)))
    print(f"floor   : {ms:8.2f} ms  (dispatch + 32B fetch)", flush=True)

    # h2d: blocked device_put of the query block
    ms = _time(lambda: jax.device_put(q128).block_until_ready())
    print(f"h2d     : {ms:8.2f} ms  (64 KB device_put, blocked)", flush=True)

    # production window chain (what search_stream does for 100 queries)
    def window_chain():
        qdev = corpus.stream_stage_queries(q128)
        resolver = corpus.stream_submit(qdev, 0, 128, K, Metric.IP)
        return resolver(q128)

    ms = _time(window_chain)
    print(f"window  : {ms:8.2f} ms  -> headline {ms / NQ:.3f} ms/query", flush=True)

    # nostage: one-shot submit, H2D rides the dispatch
    def nostage():
        resolver = corpus.search_submit(q128, K, Metric.IP)
        return resolver()

    ms = _time(nostage)
    print(f"nostage : {ms:8.2f} ms  -> headline {ms / NQ:.3f} ms/query", flush=True)

    # depthW: NQ/W windows of width W, ALL submitted before any resolve —
    # every D2H is kicked async at submit, so the resolves overlap and the
    # stream costs ~one RTT + sum of scans (each window rescans the corpus,
    # ~1.7 ms/scan, so splitting pays device time to buy transport overlap)
    def make_depth(width):
        def run():
            qdev = corpus.stream_stage_queries(q128)
            rs = [
                (corpus.stream_submit(qdev, s, width, K, Metric.IP), s)
                for s in range(0, 128, width)
            ]
            return [r(q128[s : s + width]) for r, s in rs]

        return run

    for width in (64, 32, 16):
        ms = _time(make_depth(width))
        print(f"depth{128 // width:<3d}w{width:<3d}: {ms:8.2f} ms  "
              f"-> headline {ms / NQ:.3f} ms/query", flush=True)

    # capped3: 8x16 windows but max 3 in flight (the production drain
    # policy) — does the cap serialize the tail?
    def capped3():
        qdev = corpus.stream_stage_queries(q128)
        in_flight = []
        out = []
        for s in range(0, 128, 16):
            in_flight.append((corpus.stream_submit(qdev, s, 16, K, Metric.IP), s))
            if len(in_flight) > 2:
                r, s0 = in_flight.pop(0)
                out.append(r(q128[s0 : s0 + 16]))
        for r, s0 in in_flight:
            out.append(r(q128[s0 : s0 + 16]))
        return out

    ms = _time(capped3)
    print(f"capped3 w16: {ms:8.2f} ms  -> headline {ms / NQ:.3f} ms/query", flush=True)


if __name__ == "__main__":
    main()
