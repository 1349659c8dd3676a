"""Masked top-k selection and cross-block merge helpers.

The reference engine selects top-k with an O(n) quickselect on CPU
(reference: src/distance/mod.rs:373-470). On TPU we instead orient every
metric into a "bigger is better" key, mask invalid rows to -inf, and use
``jax.lax.top_k`` (which resolves ties toward the lower index,
deterministically).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


def orient(scores: jnp.ndarray, ascending: bool) -> jnp.ndarray:
    """Map scores into descending-key space (bigger = more similar)."""
    return -scores if ascending else scores


def unorient(keys: jnp.ndarray, ascending: bool) -> jnp.ndarray:
    return -keys if ascending else keys


# Below this k, top-k runs as k argmax+mask passes instead of lax.top_k:
# the TPU sort behind lax.top_k is slow (and pathologically slow to compile)
# on very long lanes, while k linear passes fuse into the producing matmul.
ITERATIVE_TOPK_MAX_K = 128
# ...but only on lanes long enough that the sort is the bottleneck.
ITERATIVE_TOPK_MIN_N = 65_536


def iterative_top_k(keyed: jnp.ndarray, k: int):
    """k passes of (argmax, mask) over (B, N) keys — bandwidth-bound, no sort."""
    b, n = keyed.shape

    def body(i, carry):
        keyed, vals, idxs = carry
        ix = jnp.argmax(keyed, axis=1)
        v = jnp.take_along_axis(keyed, ix[:, None], axis=1)[:, 0]
        col = jax.lax.broadcasted_iota(jnp.int32, keyed.shape, 1)
        keyed = jnp.where(col == ix[:, None].astype(jnp.int32), NEG_INF, keyed)
        return keyed, vals.at[:, i].set(v), idxs.at[:, i].set(ix.astype(jnp.int32))

    vals = jnp.full((b, k), NEG_INF)
    idxs = jnp.zeros((b, k), dtype=jnp.int32)
    _, vals, idxs = jax.lax.fori_loop(0, k, body, (keyed, vals, idxs))
    return vals, idxs


def masked_top_k(
    scores: jnp.ndarray,
    k: int,
    ascending: bool,
    valid: jnp.ndarray | None = None,
):
    """Top-k of a (B, N) score matrix.

    Returns ``(dists (B,k), idx (B,k))`` in the metric's native orientation.
    Invalid rows come back with ``dist == +inf`` (ascending) / ``-inf``
    (descending); callers drop them by checking the oriented key for -inf.
    """
    keyed = orient(scores, ascending)
    keyed = jnp.where(jnp.isnan(keyed), NEG_INF, keyed)
    if valid is not None:
        if valid.ndim == 1:
            valid = valid[None, :]
        keyed = jnp.where(valid, keyed, NEG_INF)
    k = min(k, scores.shape[-1])
    if k <= ITERATIVE_TOPK_MAX_K and scores.shape[-1] >= ITERATIVE_TOPK_MIN_N:
        top_keys, idx = iterative_top_k(keyed, k)
    else:
        top_keys, idx = jax.lax.top_k(keyed, k)
    return unorient(top_keys, ascending), idx


@partial(jax.jit, static_argnames=("k", "ascending"))
def merge_top_k(dists: jnp.ndarray, ids: jnp.ndarray, k: int, ascending: bool):
    """Merge per-block top-k candidate lists.

    ``dists``/``ids`` are (B, M) with M >= k candidates (concatenated block
    results, already globally indexed). Returns (B, k) merged results.
    This is also the cross-shard merge used by the mesh-parallel path —
    the moral equivalent of the reference's k-way merge
    (reference: src/cluster.rs:327).
    """
    keyed = orient(dists, ascending)
    keyed = jnp.where(jnp.isnan(keyed), NEG_INF, keyed)
    k = min(k, dists.shape[-1])
    top_keys, pos = jax.lax.top_k(keyed, k)
    merged_ids = jnp.take_along_axis(ids, pos, axis=-1)
    return unorient(top_keys, ascending), merged_ids
