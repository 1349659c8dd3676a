"""On-TPU k-means: k-means++ init + Lloyd iterations as batched matmuls.

Replaces the reference's rayon-parallel CPU k-means
(reference: src/index/kmeans.rs:55 train_l2, :74 train_for_metric,
:237 assign_metric). Assignment is a (chunk, D) x (D, K) MXU matmul with the
L2 expansion; centroid updates are segment-sums carried through a lax.scan
over corpus chunks, so memory stays bounded at any corpus size. Deterministic
under a fixed seed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ASSIGN_CHUNK = 65536


def _l2_scores(x, c, c_sq):
    """(N, K) squared-L2 distances; x (N, D), c (K, D)."""
    ip = jax.lax.dot_general(
        x, c.T, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return jnp.maximum(x_sq + c_sq[None, :] - 2.0 * ip, 0.0)


@partial(jax.jit, static_argnames=("k",))
def _kmeans_pp_init(data: jnp.ndarray, k: int, seed: jnp.ndarray) -> jnp.ndarray:
    """k-means++ seeding on (already subsampled) data."""
    n, d = data.shape
    key = jax.random.PRNGKey(seed[0])
    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, n)
    centroids = jnp.zeros((k, d), dtype=jnp.float32).at[0].set(data[first])

    d0 = jnp.sum((data - data[first][None, :]) ** 2, axis=-1)

    def body(i, carry):
        centroids, min_d, key = carry
        key, sub = jax.random.split(key)
        total = jnp.sum(min_d)
        # sample proportional to squared distance (uniform fallback if all 0)
        probs = jnp.where(total > 0, min_d / jnp.maximum(total, 1e-30), 1.0 / n)
        idx = jax.random.choice(sub, n, p=probs)
        c = data[idx]
        centroids = centroids.at[i].set(c)
        new_d = jnp.sum((data - c[None, :]) ** 2, axis=-1)
        return centroids, jnp.minimum(min_d, new_d), key

    centroids, _, _ = jax.lax.fori_loop(1, k, body, (centroids, d0, key))
    return centroids


@partial(jax.jit, static_argnames=("chunk",))
def _lloyd_step(data: jnp.ndarray, valid: jnp.ndarray, centroids: jnp.ndarray, chunk: int):
    """One Lloyd iteration via chunked scan. Returns (new_centroids, counts,
    shift) where shift is the max centroid movement (for convergence)."""
    k, d = centroids.shape
    n = data.shape[0]
    n_chunks = max(n // chunk, 1)
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    data_c = data.reshape(n_chunks, n // n_chunks, d)
    valid_c = valid.reshape(n_chunks, n // n_chunks)

    def step(carry, operand):
        sums, counts = carry
        x, v = operand
        scores = _l2_scores(x, centroids, c_sq)
        assign = jnp.argmin(scores, axis=-1)
        w = v.astype(jnp.float32)
        one_hot = jax.nn.one_hot(assign, k, dtype=jnp.float32) * w[:, None]
        sums = sums + jax.lax.dot_general(
            one_hot.T, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = counts + jnp.sum(one_hot, axis=0)
        return (sums, counts), None

    (sums, counts), _ = jax.lax.scan(
        step,
        (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)),
        (data_c, valid_c),
    )
    new_centroids = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids
    )
    shift = jnp.max(jnp.sum((new_centroids - centroids) ** 2, axis=-1))
    return new_centroids, counts, shift


@partial(jax.jit, static_argnames=("chunk",))
def assign_clusters(data: jnp.ndarray, centroids: jnp.ndarray, chunk: int = ASSIGN_CHUNK):
    """(N,) nearest-centroid assignment (L2) via chunked matmul scan."""
    n, d = data.shape
    n_chunks = max(n // chunk, 1)
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    data_c = data.reshape(n_chunks, n // n_chunks, d)

    def body(x):
        return jnp.argmin(_l2_scores(x, centroids, c_sq), axis=-1).astype(jnp.int32)

    return jax.lax.map(body, data_c).reshape(n)


def train_kmeans(
    data: np.ndarray,
    k: int,
    *,
    max_iters: int = 25,
    seed: int = 42,
    normalize: bool = False,
    tol: float = 1e-6,
) -> tuple[np.ndarray, np.ndarray]:
    """Train k-means on-device. Returns (centroids (k, D) f32,
    assignments (N,) int32).

    ``normalize=True`` L2-normalizes rows first (cosine-metric routing,
    reference kmeans.rs:74 train_for_metric).
    """
    data = np.ascontiguousarray(data, dtype=np.float32)
    n, d = data.shape
    k = min(k, n)
    if normalize:
        norms = np.linalg.norm(data, axis=1, keepdims=True)
        data = data / np.maximum(norms, 1e-30)

    # adaptive subsample for init + training (reference seeds on a subsample)
    rng = np.random.default_rng(seed)
    train_cap = max(k * 256, 16_384)
    if n > train_cap:
        sample_idx = rng.choice(n, train_cap, replace=False)
        train_np = data[sample_idx]
    else:
        train_np = data

    # pad training rows to a chunk-friendly multiple
    t = train_np.shape[0]
    chunk = min(ASSIGN_CHUNK, 8192)
    t_pad = ((t + chunk - 1) // chunk) * chunk
    padded = np.zeros((t_pad, d), dtype=np.float32)
    padded[:t] = train_np
    train = jnp.asarray(padded)
    valid = jnp.asarray(np.arange(t_pad) < t)

    init_pool = train_np[rng.choice(t, min(t, max(k * 16, 1024)), replace=False)]
    centroids = _kmeans_pp_init(jnp.asarray(init_pool), k, jnp.asarray([seed]))

    for _ in range(max_iters):
        centroids, counts, shift = _lloyd_step(train, valid, centroids, chunk)
        if float(shift) <= tol:
            break

    # full-corpus assignment
    n_pad = ((n + chunk - 1) // chunk) * chunk
    full = np.zeros((n_pad, d), dtype=np.float32)
    full[:n] = data
    assigns = np.asarray(assign_clusters(jnp.asarray(full), centroids, chunk))[:n]
    return np.asarray(centroids), assigns.astype(np.int32)
