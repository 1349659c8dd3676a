"""Warm-up decomposition probe: where does the cold-start time go?

Splits open->first-search into device init / H2D / trace / client compile /
first execution / steady-state execution, with the persistent XLA
compilation cache enabled — so it shows exactly which stage the cache can
and cannot help (results: benchmarks/warmup_probe_r03.log).

Usage: python scripts/warmup_probe.py [N_ROWS]
"""

import os
import sys
import time

os.makedirs(os.path.expanduser("~/.cache/lynsedb_tpu/xla"), exist_ok=True)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/lynsedb_tpu/xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np

t_start = time.perf_counter()
t0 = time.perf_counter()
dev = jax.devices()[0]
print(f"device init: {time.perf_counter() - t0:.1f}s ({dev})")

n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_032
xh = np.random.default_rng(0).normal(size=(n, 128)).astype(np.float32)
t0 = time.perf_counter()
x = jax.device_put(jnp.asarray(xh).astype(jnp.bfloat16))
x.block_until_ready()
print(f"H2D+cast {n}x128: {time.perf_counter() - t0:.1f}s")

q = jnp.asarray(np.zeros((7, 128), np.float32))


@jax.jit
def f(q, x):
    s = jax.lax.dot_general(
        q.astype(jnp.bfloat16), x.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.approx_max_k(s, 64)[0]


t0 = time.perf_counter()
lowered = f.lower(q, x)
print(f"trace+lower: {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"client compile: {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
np.asarray(compiled(q, x))
print(f"1st exec+fetch: {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
np.asarray(compiled(q, x))
print(f"2nd exec+fetch: {time.perf_counter() - t0:.3f}s")
print(f"total: {time.perf_counter() - t_start:.1f}s")
