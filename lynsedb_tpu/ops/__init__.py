"""TPU compute core: distance kernels, fused top-k scans, k-means,
quantization. Everything here is pure JAX/Pallas and jit-safe."""

import os as _os

import jax as _jax

# Persistent compilation cache: remote-TPU compile round trips are expensive
# (minutes per new shape over a tunneled chip); the cache amortizes them
# across processes. Opt out with LYNSE_JAX_CACHE=0.
if _os.environ.get("LYNSE_JAX_CACHE", "1") != "0":
    _cache_dir = _os.environ.get(
        "LYNSE_JAX_CACHE_DIR", _os.path.expanduser("~/.lynsedb_tpu/jax_cache")
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
