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
    # lax.top_k on TPU handles million-long lanes at near-bandwidth cost
    # (an iterative argmax-and-mask formulation measured 6x slower and
    # pathologically slow to compile — do not resurrect it).
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
