"""On-device timing probe: where does the per-window time actually go?

The dev tunnel makes host-side micro-timings meaningless (~30 ms per
dispatch-chain regardless of work), so each variant runs ITERS times inside
ONE jitted lax.fori_loop with loop-varying inputs, and we time a single
fetch. Device time per iteration = wall / ITERS (the tunnel cost amortizes
to ~0).

Variants, at B in {16, 64, 256} over an N x 128 bf16 corpus:
  matmul        - bf16 scores only (reduced to (B,8) so the fetch is tiny)
  topk          - scores + lax.top_k(C=64)
  approx        - scores + lax.approx_max_k(C=64)

Usage: python scripts/tpu_probe.py [N] [ITERS]
"""

from __future__ import annotations

import sys
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
D = 128
C = 64


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    rng = np.random.default_rng(0)
    n_pad = ((N + 8191) // 8192) * 8192
    x = rng.normal(size=(n_pad, D)).astype(np.float32)
    t0 = time.perf_counter()
    x16 = jax.device_put(jnp.asarray(x).astype(jnp.bfloat16))
    x16.block_until_ready()
    print(f"H2D+cast {n_pad}x{D}: {time.perf_counter() - t0:.1f}s", flush=True)

    def scores_of(q16):
        return jax.lax.dot_general(
            q16, x16.T, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def make_loop(select):
        def step(i, carry):
            q, acc = carry
            qi = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            out = select(scores_of(qi))
            return (q, acc + out[:, :8].astype(jnp.float32))

        @jax.jit
        def run(q):
            q16 = q.astype(jnp.bfloat16)
            _, acc = jax.lax.fori_loop(
                0, ITERS, step, (q16, jnp.zeros((q.shape[0], 8), jnp.float32)))
            return acc

        return run

    variants = {
        "matmul": lambda s: s,
        "topk": lambda s: jax.lax.top_k(s, C)[0],
        "approx": lambda s: jax.lax.approx_max_k(s, C)[0],
    }

    for b in (16, 64, 256):
        q = jnp.asarray(rng.normal(size=(b, D)).astype(np.float32))
        for name, sel in variants.items():
            run = make_loop(sel)
            t0 = time.perf_counter()
            r = run(q)
            np.asarray(r)  # real sync (block_until_ready lies via the tunnel)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(run(q + 1.0))
            wall = time.perf_counter() - t0
            per_iter_ms = wall / ITERS * 1e3
            bw = n_pad * D * 2 * ITERS / wall / 1e9
            print(
                f"B={b:4d} {name:7s}: {per_iter_ms:8.3f} ms/iter "
                f"(scan bw {bw:7.1f} GB/s, compile+1st {compile_s:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
