"""Tunnel dispatch-floor microbench.

Separates the per-dispatch round-trip cost of this environment (axon
tunnel to a remote TPU) from engine time, so sequential-search numbers
can be judged against the floor they cannot beat (VERDICT r4 weak #6:
sequential 33.2 ms/query vs the reference CPU's 6.013 ms — how much of
that is engine?).

Measures, each over ITERS round trips (median + p10/p90):
  empty    — jitted x+1 on a (8,) f32, block_until_ready each iter
  fetch1   — same but np.asarray fetch of the (8,) result
  fetch64k — dispatch + fetch of a (1, 64) i32 + (1, 64) f32 pair
             (the shape the production B=1 shortlist fetch moves)
  h2d      — device_put of a (1, 128) f32 query + tiny dispatch
  chain4   — 4 dependent dispatches then one fetch (does the tunnel
             pipeline dependent dispatches without waiting?)

Usage: python scripts/dispatch_floor.py [ITERS]
"""

from __future__ import annotations

import sys
import time

import numpy as np

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def timed(fn, iters=ITERS, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2], ts[len(ts) // 10], ts[(len(ts) * 9) // 10]


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)

    @jax.jit
    def bump(x):
        return x + 1.0

    @jax.jit
    def bump2(x):
        return x * 1.000001 + 0.5

    x8 = jnp.zeros(8, jnp.float32)
    bump(x8).block_until_ready()
    bump2(x8).block_until_ready()

    med, p10, p90 = timed(lambda: bump(x8).block_until_ready())
    print(f"empty    : {med:7.3f} ms (p10 {p10:.3f} / p90 {p90:.3f})", flush=True)

    med, p10, p90 = timed(lambda: np.asarray(bump(x8)))
    print(f"fetch1   : {med:7.3f} ms (p10 {p10:.3f} / p90 {p90:.3f})", flush=True)

    @jax.jit
    def shortlist_like(x):
        i = jnp.argsort(x, axis=-1)[:, :64].astype(jnp.int32)
        return i, x[:, :64]

    xs = jnp.zeros((1, 256), jnp.float32)
    jax.block_until_ready(shortlist_like(xs))

    def fetch_pair():
        i, d = shortlist_like(xs)
        np.asarray(i), np.asarray(d)

    med, p10, p90 = timed(fetch_pair)
    print(f"fetch64k : {med:7.3f} ms (p10 {p10:.3f} / p90 {p90:.3f})", flush=True)

    qh = np.zeros((1, 128), np.float32)

    def h2d():
        qd = jnp.asarray(qh)
        bump(qd).block_until_ready()

    med, p10, p90 = timed(h2d)
    print(f"h2d      : {med:7.3f} ms (p10 {p10:.3f} / p90 {p90:.3f})", flush=True)

    def chain4():
        y = bump(x8)
        for _ in range(3):
            y = bump2(y)
        np.asarray(y)

    med, p10, p90 = timed(chain4)
    print(f"chain4   : {med:7.3f} ms (p10 {p10:.3f} / p90 {p90:.3f})", flush=True)

    # h2d BANDWIDTH (blocked device_put), the >HBM streaming-scan floor:
    # a streaming pass must move the whole bf16 corpus over this link, so
    # ms/query = corpus_bytes / bandwidth / stream_length + engine time.
    # (The r05 leg probe's "staged in 1.91s" timed only the async enqueue.)
    import ml_dtypes

    for mb in (8, 32, 256):
        n = mb * 1024 * 1024 // 256
        a16 = np.zeros((n, 128), dtype=ml_dtypes.bfloat16)
        best = float("inf")
        for _ in range(3 if mb <= 32 else 2):
            t0 = time.perf_counter()
            d = jax.device_put(a16)
            jax.block_until_ready(d)
            best = min(best, time.perf_counter() - t0)
            del d
        print(f"h2d {mb:4d}MB: {best*1e3:9.1f} ms -> {mb/best:7.1f} MB/s",
              flush=True)


if __name__ == "__main__":
    main()
