"""search_stream equivalence: the pipelined window plane must return exactly
what per-query ``search`` returns, across auto/explicit window shapes, odd
stream lengths (window padding), filters, and the ANN fallback path.

Reference parity anchor: the reference serves streams as sequential searches
(python/lynse/api/http_api/client_api.py) — the stream API is this repo's
TPU-native serving shape, so its contract is defined against ``search``.
"""

import numpy as np
import pytest


def _assert_stream_matches_sequential(coll, queries, k, **kw):
    stream = coll.search_stream(queries, k=k, **kw)
    assert len(stream) == len(queries)
    for i, r in enumerate(stream):
        want = coll.search(queries[i], k=k, **{m: v for m, v in kw.items() if m != "window"})
        np.testing.assert_array_equal(np.asarray(r.ids), np.asarray(want.ids))
        np.testing.assert_allclose(
            np.asarray(r.distances), np.asarray(want.distances), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("n_q", [1, 10, 33, 100, 129])
def test_stream_matches_sequential_auto_window(db, rng, n_q):
    coll = db.require_collection(f"st{n_q}", dim=24, drop_if_exists=True)
    vecs = rng.normal(size=(900, 24)).astype(np.float32)
    coll.add(list(range(900)), vectors=vecs)
    coll.commit()
    queries = rng.normal(size=(n_q, 24)).astype(np.float32)
    _assert_stream_matches_sequential(coll, queries, k=7)


@pytest.mark.parametrize("window", [1, 4, 16, 64])
def test_stream_matches_sequential_explicit_window(db, rng, window):
    coll = db.require_collection(f"stw{window}", dim=16, drop_if_exists=True)
    vecs = rng.normal(size=(400, 16)).astype(np.float32)
    coll.add(list(range(400)), vectors=vecs)
    coll.commit()
    queries = rng.normal(size=(50, 16)).astype(np.float32)
    _assert_stream_matches_sequential(coll, queries, k=5, window=window)


def test_stream_with_filter_matches_sequential(db, rng):
    coll = db.require_collection("stf", dim=16, drop_if_exists=True)
    vecs = rng.normal(size=(600, 16)).astype(np.float32)
    coll.add(
        list(range(600)),
        vectors=vecs,
        fields=[{"bucket": i % 4} for i in range(600)],
    )
    coll.commit()
    queries = rng.normal(size=(40, 16)).astype(np.float32)
    _assert_stream_matches_sequential(coll, queries, k=5, where="bucket = 2")


@pytest.mark.parametrize("metric", ["L2", "COSINE"])
def test_stream_non_ip_metrics(db, rng, metric):
    coll = db.require_collection(f"stm{metric}", dim=16, drop_if_exists=True)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    coll.add(list(range(300)), vectors=vecs)
    coll.commit()
    coll.build_index(f"FLAT-{metric}")
    queries = rng.normal(size=(37, 16)).astype(np.float32)
    _assert_stream_matches_sequential(coll, queries, k=5)


def test_stream_k_larger_than_rows(db, rng):
    coll = db.require_collection("stk", dim=8, drop_if_exists=True)
    vecs = rng.normal(size=(6, 8)).astype(np.float32)
    coll.add(list(range(6)), vectors=vecs)
    coll.commit()
    queries = rng.normal(size=(40, 8)).astype(np.float32)
    stream = coll.search_stream(queries, k=10)
    assert len(stream) == 40
    for r in stream:
        assert len(r.ids) == 6  # clamped to live rows, no padded -1 ids
        assert (np.asarray(r.ids) >= 0).all()
