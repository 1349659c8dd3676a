"""Tests for the fused flat-scan engine (DeviceCorpus + chunked top-k)."""

import numpy as np
import pytest

from lynsedb_tpu.metrics import Metric
from lynsedb_tpu.ops.scan import DeviceCorpus, flat_topk, scan_chunk_size
from lynsedb_tpu.ops import distance as D

import jax.numpy as jnp


def _brute_topk(q, x, metric, k, valid=None):
    scores = np.asarray(D.pairwise_distances(jnp.asarray(q), jnp.asarray(x), metric))
    if valid is not None:
        scores = np.where(valid[None, :], scores, np.inf if metric.ascending else -np.inf)
    order = np.argsort(scores, axis=1, kind="stable")
    if not metric.ascending:
        order = order[:, ::-1]
    return order[:, :k]


@pytest.mark.parametrize("metric", [Metric.IP, Metric.L2, Metric.COSINE, Metric.L1])
def test_device_corpus_topk_matches_brute(metric, rng):
    n, d, k = 1000, 32, 7
    x = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(3, d)).astype(np.float32)
    corpus = DeviceCorpus(d)
    corpus.append(x)
    dists, ids = corpus.search(q, k, metric)
    want = _brute_topk(q, x, metric, k)
    np.testing.assert_array_equal(ids, want)


def test_append_in_batches_equals_bulk(rng):
    d = 16
    x = rng.normal(size=(500, d)).astype(np.float32)
    c1 = DeviceCorpus(d)
    c1.append(x)
    c2 = DeviceCorpus(d)
    for i in range(0, 500, 77):
        c2.append(x[i : i + 77])
    q = rng.normal(size=(1, d)).astype(np.float32)
    d1, i1 = c1.search(q, 5, Metric.L2)
    d2, i2 = c2.search(q, 5, Metric.L2)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_tombstones_excluded(rng):
    d = 8
    x = rng.normal(size=(50, d)).astype(np.float32)
    corpus = DeviceCorpus(d)
    corpus.append(x)
    q = x[7:8]
    _, ids = corpus.search(q, 1, Metric.L2)
    assert ids[0, 0] == 7
    tombs = np.zeros(50, dtype=bool)
    tombs[7] = True
    corpus.set_tombstones(tombs)
    _, ids = corpus.search(q, 1, Metric.L2)
    assert ids[0, 0] != 7


def test_filter_mask(rng):
    d = 8
    x = rng.normal(size=(100, d)).astype(np.float32)
    corpus = DeviceCorpus(d)
    corpus.append(x)
    mask = np.zeros(100, dtype=bool)
    mask[10:20] = True
    q = rng.normal(size=(1, d)).astype(np.float32)
    _, ids = corpus.search(q, 100, Metric.L2, filter_mask=mask)
    assert set(ids[0].tolist()) == set(range(10, 20))


def test_k_larger_than_n(rng):
    d = 8
    x = rng.normal(size=(5, d)).astype(np.float32)
    corpus = DeviceCorpus(d)
    corpus.append(x)
    q = rng.normal(size=(1, d)).astype(np.float32)
    dists, ids = corpus.search(q, 50, Metric.IP)
    assert ids.shape[1] == 5
    assert sorted(ids[0].tolist()) == [0, 1, 2, 3, 4]


def test_chunked_scan_matches_single_shot(rng):
    # Force the multi-chunk path by using a small chunk size directly.
    n, d, k = 4096, 16, 9
    x = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(2, d)).astype(np.float32)
    qt = D.query_transform(jnp.asarray(q), Metric.L2)
    ct = D.corpus_transform(jnp.asarray(x), Metric.L2)
    valid = jnp.ones(n, dtype=bool)
    d_multi, i_multi = flat_topk(qt, ct, valid, metric=Metric.L2, k=k, chunk=512, ascending=True)
    d_one, i_one = flat_topk(qt, ct, valid, metric=Metric.L2, k=k, chunk=n, ascending=True)
    np.testing.assert_array_equal(np.asarray(i_multi), np.asarray(i_one))
    np.testing.assert_allclose(np.asarray(d_multi), np.asarray(d_one), rtol=1e-6)


def test_chunked_scan_with_remainder_tail(rng):
    # n_pad not a multiple of chunk (regression: 123 blocks vs 16-block chunks)
    n, d, k = 5 * 512 + 256, 16, 11
    x = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(2, d)).astype(np.float32)
    qt = D.query_transform(jnp.asarray(q), Metric.IP)
    ct = D.corpus_transform(jnp.asarray(x), Metric.IP)
    valid = jnp.ones(n, dtype=bool)
    d_multi, i_multi = flat_topk(qt, ct, valid, metric=Metric.IP, k=k, chunk=512, ascending=False)
    want = _brute_topk(q, x, Metric.IP, k)
    np.testing.assert_array_equal(np.asarray(i_multi), want)


def test_range_search(rng):
    d = 8
    x = rng.normal(size=(200, d)).astype(np.float32)
    corpus = DeviceCorpus(d)
    corpus.append(x)
    q = x[0]
    dists, ids = corpus.range_search(q, threshold=5.0, metric=Metric.L2, max_results=1000)
    scores = np.sum((x - q) ** 2, axis=1)
    want = set(np.nonzero(scores <= 5.0)[0].tolist())
    assert set(ids.tolist()) == want
    assert np.all(np.diff(dists) >= 0)


def test_upsert_overwrite(rng):
    d = 8
    x = rng.normal(size=(20, d)).astype(np.float32)
    corpus = DeviceCorpus(d)
    corpus.append(x)
    new_row = rng.normal(size=(1, d)).astype(np.float32) * 100
    corpus.overwrite(np.array([3]), new_row)
    _, ids = corpus.search(new_row, 1, Metric.L2)
    assert ids[0, 0] == 3


def test_rescore(rng):
    d = 8
    x = rng.normal(size=(30, d)).astype(np.float32)
    corpus = DeviceCorpus(d)
    corpus.append(x)
    q = rng.normal(size=(2, d)).astype(np.float32)
    cand = np.array([[0, 3, 5], [1, 2, 4]])
    out = corpus.rescore(q, cand, Metric.L2)
    for b in range(2):
        for j, rid in enumerate(cand[b]):
            want = np.sum((q[b] - x[rid]) ** 2)
            np.testing.assert_allclose(out[b, j], want, rtol=1e-5)


def test_f16_storage(rng):
    d = 8
    x = rng.normal(size=(40, d)).astype(np.float32)
    corpus = DeviceCorpus(d, dtype="float16")
    corpus.append(x)
    q = x[5:6]
    _, ids = corpus.search(q, 1, Metric.L2)
    assert ids[0, 0] == 5


def test_scan_chunk_size():
    assert scan_chunk_size(Metric.IP, 8192) == 8192
    # matmul metrics go single-shot while the score matrix fits
    assert scan_chunk_size(Metric.IP, 1 << 20, batch=1) == 1 << 20
    assert scan_chunk_size(Metric.IP, 1 << 20, batch=1024) == 131072
    assert scan_chunk_size(Metric.L1, 1 << 20) == 8192


def test_host_mirror_spills_to_memmap(rng, monkeypatch):
    """Mirrors beyond LYNSE_TPU_MIRROR_RAM_BYTES page from disk (the >RAM
    corpus story, analogous to the reference's mmap storage)."""
    from lynsedb_tpu.ops import scan as scan_mod

    monkeypatch.setattr(scan_mod, "MIRROR_RAM_BYTES", 64 * 1024)  # tiny cap
    dc = scan_mod.DeviceCorpus(16)
    x = rng.normal(size=(9000, 16)).astype(np.float32)
    dc.append(x[:5000])
    dc.append(x[5000:])  # growth copies chunked through the memmap
    assert isinstance(dc._host, np.memmap)
    dc.finalize()
    q = x[7:8]
    d, i = dc.search(q, 5, Metric.IP)
    want = np.argsort(-(x @ q[0]))[:5]
    assert i[0].tolist() == want.tolist()
    np.testing.assert_allclose(d[0], np.sort(x @ q[0])[::-1][:5], rtol=1e-6)


class TestStreamingScan:
    """Blockwise >HBM streaming mode (reference capability: mmap scan beyond
    RAM, flat_mmap.rs:89) forced via a tiny HBM budget."""

    @pytest.fixture()
    def stream_corpus(self, rng, monkeypatch):
        import lynsedb_tpu.ops.scan as scan_mod

        monkeypatch.setattr(scan_mod, "HBM_BYTES", 1 << 20)  # 1 MB: force streaming
        monkeypatch.setattr(scan_mod, "STREAM_BLOCK_BYTES", 1 << 22)
        c = DeviceCorpus(dim=32)
        data = rng.normal(size=(40_000, 32)).astype(np.float32)
        c.append(data)
        return c, data

    def test_streaming_engages_and_matches_exact(self, stream_corpus, rng):
        c, data = stream_corpus
        q = rng.normal(size=(3, 32)).astype(np.float32)
        d, i = c.search(q, 10, Metric.IP)
        assert c.streaming and c._dev16 is None
        want = np.argsort(-(q @ data.T), axis=1)[:, :10]
        for row in range(3):
            assert set(i[row].tolist()) == set(want[row].tolist())
            np.testing.assert_allclose(
                d[row], np.sort((q[row] @ data[i[row]].T))[::-1], rtol=1e-5)

    def test_streaming_l2_and_elementwise(self, stream_corpus, rng):
        c, data = stream_corpus
        q = rng.normal(size=(2, 32)).astype(np.float32)
        d, i = c.search(q, 5, Metric.L2)
        want = np.argsort(((data[None] - q[:, None]) ** 2).sum(-1), axis=1)[:, :5]
        assert set(i[0].tolist()) == set(want[0].tolist())
        # elementwise metric streams through bf16_flat_topk blocks + rescore
        d, i = c.search(q, 5, Metric.L1)
        want = np.argsort(np.abs(data[None] - q[:, None]).sum(-1), axis=1)[:, :5]
        overlap = len(set(i[0].tolist()) & set(want[0].tolist()))
        assert overlap >= 4  # bf16 proxy ties can swap the boundary

    def test_streaming_filters_tombstones_overwrite(self, stream_corpus, rng):
        c, data = stream_corpus
        q = rng.normal(size=(1, 32)).astype(np.float32)
        # selective filter -> host compact path
        mask = np.zeros(len(data), dtype=bool)
        mask[:500] = True
        d, i = c.search(q, 5, Metric.IP, filter_mask=mask)
        assert (i < 500).all()
        want = np.argsort(-(q @ data[:500].T), axis=1)[:, :5]
        assert set(i[0].tolist()) == set(want[0].tolist())
        # non-selective filter -> per-block mask
        mask2 = np.ones(len(data), dtype=bool)
        mask2[::2] = False
        d, i = c.search(q, 5, Metric.IP, filter_mask=mask2)
        assert (i[0] % 2 == 1).all()
        # tombstones
        top = int(np.argmax(q[0] @ data.T))
        tombs = np.zeros(len(data), dtype=bool)
        tombs[top] = True
        c.set_tombstones(tombs)
        d, i = c.search(q, 5, Metric.IP)
        assert top not in i[0].tolist()
        c.set_tombstones(np.zeros(len(data), dtype=bool))
        # overwrite updates the host16 mirror in place
        new_row = (q[0] * 10).astype(np.float32)
        c.overwrite(np.asarray([123]), new_row[None])
        d, i = c.search(q, 1, Metric.IP)
        assert i[0, 0] == 123

    def test_streaming_range_search(self, stream_corpus, rng):
        c, data = stream_corpus
        q = rng.normal(size=32).astype(np.float32)
        scores = data @ q
        thr = float(np.percentile(scores, 99.99))
        d, i = c.range_search(q, thr, Metric.IP, max_results=100)
        want = np.nonzero(scores >= thr)[0]
        assert set(i.tolist()) == set(want.tolist())
        assert (np.diff(d) <= 1e-6).all()  # best-first
