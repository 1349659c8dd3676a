"""Does the JAX persistent compilation cache work through the axon plugin?

Times first execution of a distinctly-shaped executable with
jax_compilation_cache_dir set. Run TWICE in separate processes: if the
second process's first-exec is fast, server-side executables are
serializable and the engine can ship a persistent cache for cold starts
(reference startup bar: 2.087 ms, vector_database_benchmarks.md:176 — this
repo's tunnel-bound second-process open->first-search was 344.6 s in r3).

Usage: python scripts/compile_cache_probe.py [tag]
"""
import sys
import time
from pathlib import Path

CACHE = Path(__file__).resolve().parent.parent / "benchmarks" / "data" / "xla_cache_probe"
CACHE.mkdir(parents=True, exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", str(CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

tag = sys.argv[1] if len(sys.argv) > 1 else "?"
print(f"[{tag}] backend: {jax.default_backend()} devices: {jax.devices()}", flush=True)


@jax.jit
def scanlike(x, q):
    # shaped like the fused scan: (N, D) x (B, D) -> top-ish reduction
    s = q @ x.T
    return jnp.sort(s, axis=1)[:, -13:]  # odd widths keep the shape distinct


x = jnp.zeros((300_017, 128), jnp.bfloat16)
q = jnp.zeros((96, 128), jnp.bfloat16)
t0 = time.perf_counter()
jax.block_until_ready(scanlike(x, q))
print(f"[{tag}] first exec (compile or cache hit): {time.perf_counter()-t0:.2f}s",
      flush=True)
t0 = time.perf_counter()
jax.block_until_ready(scanlike(x, q))
print(f"[{tag}] second exec (warm): {time.perf_counter()-t0:.3f}s", flush=True)
