"""Low-level compute passthroughs (reference: python/lynse/_backend.py:251
compute_distance / :260 top_k_search — the raw-kernel surface exposed beside
the collection API)."""

from __future__ import annotations

import numpy as np

from .metrics import Metric
from .ops.distance import compute_distance, pairwise_distances  # noqa: F401
from .ops.topk import masked_top_k


def top_k_search(query, candidates, k: int = 10, metric: str | Metric = "ip"):
    """Exact top-k of ``query`` against a candidate matrix on the device.

    Returns (indices (k',), distances (k',)) ordered best-first.
    """
    import jax.numpy as jnp

    if isinstance(metric, str):
        m = Metric.parse(metric)
        if m is None:
            raise ValueError(f"unknown metric: {metric}")
        metric = m
    q = jnp.asarray(np.asarray(query, dtype=np.float32).reshape(1, -1))
    x = jnp.asarray(np.ascontiguousarray(candidates, dtype=np.float32))
    scores = pairwise_distances(q, x, metric)
    d, i = masked_top_k(scores, min(k, x.shape[0]), metric.ascending)
    return np.asarray(i[0], dtype=np.int64), np.asarray(d[0], dtype=np.float32)


def batch_top_k_search(queries, candidates, k: int = 10, metric: str | Metric = "ip"):
    import jax.numpy as jnp

    if isinstance(metric, str):
        metric = Metric.parse(metric)
    q = jnp.asarray(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
    x = jnp.asarray(np.ascontiguousarray(candidates, dtype=np.float32))
    scores = pairwise_distances(q, x, metric)
    d, i = masked_top_k(scores, min(k, x.shape[0]), metric.ascending)
    return np.asarray(i, dtype=np.int64), np.asarray(d, dtype=np.float32)
