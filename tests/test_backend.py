"""Backend passthrough surface tests (reference:
tests/standard_tests/test_backend.py — the raw compute_distance /
top_k_search kernels exposed beside the collection API)."""

import numpy as np
import pytest

from lynsedb_tpu import backend
from lynsedb_tpu.metrics import Metric

from np_reference import FNS


@pytest.mark.parametrize("metric", ["ip", "l2", "cosine", "l1", "chebyshev"])
def test_compute_distance_matches_numpy(metric, rng):
    a = rng.normal(size=24).astype(np.float32)
    b = rng.normal(size=24).astype(np.float32)
    got = float(backend.compute_distance(a, b, metric))
    want = FNS[metric](a, b)
    assert got == pytest.approx(want, rel=2e-5, abs=2e-5)


def test_compute_distance_unknown_metric_raises(rng):
    a = rng.normal(size=8).astype(np.float32)
    with pytest.raises(Exception):
        backend.compute_distance(a, a, "not_a_metric")


@pytest.mark.parametrize("metric", ["ip", "l2", "cosine"])
def test_top_k_search_order(metric, rng):
    x = rng.normal(size=(300, 16)).astype(np.float32)
    q = rng.normal(size=16).astype(np.float32)
    idx, dists = backend.top_k_search(q, x, k=7, metric=metric)
    assert idx.shape == (7,)
    fn = FNS[metric]
    scores = np.array([fn(q, row) for row in x])
    order = np.argsort(scores if metric != "ip" else -scores)[:7]
    got_scores = scores[idx]
    np.testing.assert_allclose(got_scores, scores[order], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dists, got_scores, rtol=2e-4, atol=2e-4)


def test_top_k_search_k_exceeds_n(rng):
    x = rng.normal(size=(5, 8)).astype(np.float32)
    idx, dists = backend.top_k_search(x[0], x, k=50)
    assert len(idx) == 5


def test_batch_top_k_matches_loop(rng):
    x = rng.normal(size=(200, 8)).astype(np.float32)
    qs = rng.normal(size=(4, 8)).astype(np.float32)
    bi, bd = backend.batch_top_k_search(qs, x, k=5, metric="l2")
    assert bi.shape == (4, 5)
    for row in range(4):
        si, sd = backend.top_k_search(qs[row], x, k=5, metric="l2")
        np.testing.assert_array_equal(bi[row], si)
        np.testing.assert_allclose(bd[row], sd, rtol=1e-6)


def test_metric_enum_accepted_directly(rng):
    x = rng.normal(size=(50, 8)).astype(np.float32)
    idx, _ = backend.top_k_search(x[3], x, k=1, metric=Metric.L2)
    assert int(idx[0]) == 3  # self is L2-nearest


def test_pairwise_distances_shape(rng):
    import jax.numpy as jnp

    q = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(10, 8)).astype(np.float32))
    out = backend.pairwise_distances(q, x, Metric.COSINE)
    assert out.shape == (3, 10)
