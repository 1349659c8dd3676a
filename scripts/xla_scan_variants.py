"""Device A/B of XLA first-pass scan formulations at 1M x 128.

Isolates what the production shortlist pass pays for, relative to the
r3 probe's values-only 1.9 ms reading (benchmarks/tpu_probe_r03.log):

  prod   — dim-1 contraction + masked_top_c (approx_max_k, values+indices,
           aggregate_to_topk=True): the production ops/scan.py formulation
  prodT  — same but contracting via x16.T (the r3 probe layout)
  noagg  — approx_max_k(values+indices, aggregate_to_topk=False): raw
           PartialReduce output, no final exact top-k — legal for the
           two-pass design since every caller exact-rescores the shortlist
  vals   — values-only approx_max_k (XLA DCEs the index plane; lower bound)

Method: ITERS iterations inside one jitted fori_loop with loop-varying
queries (same as scripts/tpu_probe.py), one fetch, so tunnel dispatch
cost amortizes to ~0.

Usage: python scripts/xla_scan_variants.py [N] [B] [ITERS]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
D = 128
C = 64


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    n_pad = ((N + 8191) // 8192) * 8192
    x = rng.normal(size=(n_pad, D)).astype(np.float32)
    x16 = jax.device_put(jnp.asarray(x).astype(jnp.bfloat16))
    x16.block_until_ready()

    def scores_dim1(q16):
        return jax.lax.dot_general(
            q16, x16, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def scores_T(q16):
        return jax.lax.dot_general(
            q16, x16.T, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def sel_prod(s):
        v, i = jax.lax.approx_max_k(s, C)
        return v[:, :4].astype(jnp.float32) + i[:, :4].astype(jnp.float32)

    def sel_noagg(s):
        v, i = jax.lax.approx_max_k(s, C, aggregate_to_topk=False)
        return v[:, :4].astype(jnp.float32) + i[:, :4].astype(jnp.float32)

    def sel_vals(s):
        v = jax.lax.approx_max_k(s, C)[0]
        return v[:, :4]

    variants = {
        "prod":  lambda q16: sel_prod(scores_dim1(q16)),
        "prodT": lambda q16: sel_prod(scores_T(q16)),
        "noagg": lambda q16: sel_noagg(scores_dim1(q16)),
        "vals":  lambda q16: sel_vals(scores_dim1(q16)),
    }

    def make_loop(fn):
        def step(i, carry):
            q, acc = carry
            qi = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            return (q, acc + fn(qi))

        @jax.jit
        def run(q):
            q16 = q.astype(jnp.bfloat16)
            _, acc = jax.lax.fori_loop(
                0, ITERS, step, (q16, jnp.zeros((q.shape[0], 4), jnp.float32)))
            return acc

        return run

    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    for name, fn in variants.items():
        run = make_loop(fn)
        t0 = time.perf_counter()
        np.asarray(run(q))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(q + 1.0))
        wall = time.perf_counter() - t0
        bw = n_pad * D * 2 * ITERS / wall / 1e9
        print(f"B={B} {name:6s}: {wall / ITERS * 1e3:8.3f} ms/scan "
              f"(corpus bw {bw:7.1f} GB/s, compile+1st {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
