"""TPU compute core: distance kernels, fused top-k scans, k-means,
quantization. Everything here is pure JAX/Pallas and jit-safe."""
