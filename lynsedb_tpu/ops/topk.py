"""Masked top-k selection and cross-block merge helpers.

The reference engine selects top-k with an O(n) quickselect on CPU
(reference: src/distance/mod.rs:373-470). On TPU we instead orient every
metric into a "bigger is better" key, mask invalid rows to -inf, and use
``jax.lax.top_k`` (which resolves ties toward the lower index,
deterministically).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = np.float32(-np.inf)  # host scalar: device constants stall tunnel lowering (see ops/distance.py:INF)

# Per-candidate recall target for the *shortlist* selection pass (the
# candidates are exact-rescored afterwards, so end-to-end recall@k is far
# higher than this — the misses concentrate at the shortlist boundary, and
# the shortlist is 4-16x oversampled vs k).
SHORTLIST_RECALL = float(os.environ.get("LYNSE_TPU_SHORTLIST_RECALL", "0.99"))


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


def masked_top_c(
    scores: jnp.ndarray,
    c: int,
    ascending: bool,
    valid: jnp.ndarray | None = None,
):
    """Shortlist top-C selection for two-pass searches.

    Same contract as :func:`masked_top_k` but uses ``jax.lax.approx_max_k``
    — the TPU's hardware PartialReduce op — instead of the exact sort
    network. On million-long lanes the exact ``lax.top_k`` costs multiples
    of the scan matmul itself and scales with batch; PartialReduce runs at
    near scan bandwidth. Exactness is NOT given up end-to-end: every caller
    exact-rescores the shortlist (host mirror f32) before returning, and
    the shortlist is oversampled, so recall@k stays gated at the exact-flat
    floor (0.999). On CPU backends XLA lowers approx_max_k to the exact
    top-k, so tests are bit-deterministic.

    Do NOT use this for paths whose selection IS the final answer (the
    one-pass exact scan keeps :func:`masked_top_k`).
    """
    keyed = orient(scores, ascending)
    keyed = jnp.where(jnp.isnan(keyed), NEG_INF, keyed)
    if valid is not None:
        if valid.ndim == 1:
            valid = valid[None, :]
        keyed = jnp.where(valid, keyed, NEG_INF)
    c = min(c, scores.shape[-1])
    top_keys, idx = jax.lax.approx_max_k(keyed, c, recall_target=SHORTLIST_RECALL)
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
