"""Does the axon tunnel overlap server-side first-execution compiles of
DISTINCT executables?

Four fresh-fingerprint executables are dispatched (a) back-to-back without
blocking, then blocked together, and (b) strictly sequentially, each blocked
before the next. If (a) << (b), server-side compiles overlap and a
concurrent prewarm at server start amortizes cold-start; if (a) ~= (b),
compiles serialize and prewarm can only move the cost earlier, not shrink it.

Usage: python scripts/prewarm_probe.py [n_execs]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
rng = np.random.default_rng(0)

# fresh fingerprints: prime-ish row counts nothing else uses
base = 999_983


def make(i):
    n = base - 64 * i
    x = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def f(q):
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), x.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, 37 + i)[0]

    q = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    return f, q


print(f"probing {K} fresh executables, concurrent dispatch first", flush=True)
pairs = [make(i) for i in range(K)]
jax.block_until_ready([p[1] for p in pairs])

t0 = time.perf_counter()
outs = [f(q) for f, q in pairs]  # async dispatch, no blocking between
jax.block_until_ready(outs)
concurrent_s = time.perf_counter() - t0
print(f"concurrent first-exec of {K}: {concurrent_s:.1f}s", flush=True)

pairs2 = [make(100 + i) for i in range(K)]
jax.block_until_ready([p[1] for p in pairs2])
t0 = time.perf_counter()
per = []
for f, q in pairs2:
    t1 = time.perf_counter()
    jax.block_until_ready(f(q))
    per.append(time.perf_counter() - t1)
sequential_s = time.perf_counter() - t0
print(f"sequential first-exec of {K}: {sequential_s:.1f}s "
      f"(per: {['%.1f' % p for p in per]})", flush=True)
print(f"overlap factor: {sequential_s / max(concurrent_s, 1e-9):.2f}x", flush=True)
