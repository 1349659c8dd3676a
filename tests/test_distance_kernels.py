"""Kernel-level numerical tests: TPU pairwise kernels vs f64 numpy reference."""

import numpy as np
import pytest

from np_reference import FNS
from lynsedb_tpu.metrics import Metric
from lynsedb_tpu.ops.distance import compute_distance, pairwise_distances

ALL_METRICS = [m for m in Metric]


def _data_for(metric: Metric, rng, n=37, d=33):
    if metric is Metric.HAVERSINE:
        d = 2
        lon = rng.uniform(-180, 180, size=(n, 1))
        lat = rng.uniform(-90, 90, size=(n, 1))
        return np.concatenate([lon, lat], axis=1).astype(np.float32)
    if metric in (Metric.HELLINGER, Metric.WASSERSTEIN, Metric.JENSEN_SHANNON):
        return rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    if metric.is_binary:
        return (rng.uniform(0, 1, size=(n, d)) > 0.5).astype(np.float32)
    return rng.normal(size=(n, d)).astype(np.float32)


@pytest.mark.parametrize("metric", ALL_METRICS, ids=[m.value for m in ALL_METRICS])
def test_pairwise_matches_numpy(metric, rng):
    x = _data_for(metric, rng)
    q = _data_for(metric, rng, n=5)
    got = np.asarray(pairwise_distances(q, x, metric))
    ref_fn = FNS[metric.value]
    want = np.array([[ref_fn(qr, xr) for xr in x] for qr in q])
    scale = max(1.0, np.abs(want[np.isfinite(want)]).max(initial=1.0))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4 * scale)


def test_metric_parsing_aliases():
    assert Metric.parse("dot") is Metric.IP
    assert Metric.parse("euclidean") is Metric.L2
    assert Metric.parse("COS") is Metric.COSINE
    assert Metric.parse("emd") is Metric.WASSERSTEIN
    assert Metric.parse("js") is Metric.JENSEN_SHANNON
    assert Metric.parse("nope") is None
    assert Metric.from_index_mode("HNSW-CORRELATION") is Metric.CORRELATION
    assert Metric.from_index_mode("FLAT-TANIMOTO-BINARY") is Metric.TANIMOTO
    assert Metric.from_index_mode("FLAT-L2-SQ8") is Metric.L2
    assert Metric.from_index_mode("IVF-IP") is Metric.IP
    assert Metric.from_index_mode("FLAT-JENSEN-SHANNON") is Metric.JENSEN_SHANNON


def test_ordering_contract():
    assert not Metric.IP.ascending
    for m in Metric:
        if m is not Metric.IP:
            assert m.ascending


def test_cosine_zero_norm_policy():
    a = np.zeros(8, dtype=np.float32)
    b = np.ones(8, dtype=np.float32)
    assert compute_distance(a, b, "cosine") == 1.0


def test_correlation_constant_rows():
    a = np.full(8, 3.0, dtype=np.float32)
    b = np.full(8, 3.0, dtype=np.float32)
    c = np.full(8, 5.0, dtype=np.float32)
    d = np.arange(8, dtype=np.float32)
    assert compute_distance(a, b, "correlation") == 0.0
    assert compute_distance(a, c, "correlation") == 1.0
    assert compute_distance(a, d, "correlation") == 1.0


def test_jensen_shannon_zero_mass():
    z = np.zeros(8, dtype=np.float32)
    p = np.ones(8, dtype=np.float32)
    assert compute_distance(z, z, "js") == 0.0
    np.testing.assert_allclose(
        compute_distance(z, p, "js"), np.sqrt(np.log(2)), rtol=1e-5
    )


def test_probability_metrics_reject_negative():
    a = np.array([0.5, -0.1, 0.6], dtype=np.float32)
    b = np.array([0.3, 0.3, 0.4], dtype=np.float32)
    for m in ("hellinger", "wasserstein", "js"):
        assert compute_distance(a, b, m) == np.inf


def test_haversine_known_distance():
    # London (lon, lat) -> Paris, roughly 343-344 km
    london = np.array([-0.1278, 51.5074], dtype=np.float32)
    paris = np.array([2.3522, 48.8566], dtype=np.float32)
    d = compute_distance(london, paris, "haversine")
    assert 340_000 < d < 348_000


def test_haversine_invalid_latitude():
    a = np.array([0.0, 95.0], dtype=np.float32)
    b = np.array([0.0, 10.0], dtype=np.float32)
    assert compute_distance(a, b, "haversine") == np.inf


def test_braycurtis_zero_policy():
    z = np.zeros(4, dtype=np.float32)
    assert compute_distance(z, z, "braycurtis") == 0.0


def test_binary_counts_are_exact_at_high_dim(rng):
    # bf16 inputs with f32 accumulation must stay exact for 3000-dim popcounts
    d = 3072
    a = (rng.uniform(0, 1, size=(1, d)) > 0.3).astype(np.float32)
    b = (rng.uniform(0, 1, size=(4, d)) > 0.7).astype(np.float32)
    got = np.asarray(pairwise_distances(a, b, Metric.HAMMING))[0]
    want = np.array([FNS["hamming"](a[0], r) for r in b])
    np.testing.assert_array_equal(got, want)
