"""Approximate flat search (approx=True / eps) tests."""

import numpy as np
import pytest

from lynsedb_tpu.metrics import Metric
from lynsedb_tpu.ops.scan import DeviceCorpus


def test_approx_below_threshold_is_exact(db, rng):
    coll = db.require_collection("ax_small", dim=8, drop_if_exists=True)
    vecs = rng.normal(size=(100, 8)).astype(np.float32)
    coll.add(list(range(100)), vectors=vecs)
    coll.commit()
    exact = coll.search(vecs[3], k=5)
    approx = coll.search(vecs[3], k=5, approx=True)
    assert exact.ids.tolist() == approx.ids.tolist()
    np.testing.assert_allclose(exact.distances, approx.distances, rtol=1e-6)


def test_approx_recall_above_threshold(rng):
    n, d, k = 70_000, 64, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    corpus = DeviceCorpus(d)
    corpus.append(x)
    q = rng.normal(size=(4, d)).astype(np.float32)
    want = np.argsort(-(q @ x.T), axis=1)[:, :k]
    dists, ids = corpus.search_approx(q, k, Metric.IP, eps=1e-4)
    total = 0.0
    for b in range(4):
        got = set(int(i) for i in ids[b] if i >= 0)
        total += len(got & set(want[b].tolist())) / k
    recall = total / 4
    assert recall >= 0.9, f"approx recall {recall:.3f}"
    # distances returned are exact for the ids returned
    for b in range(2):
        for j in range(3):
            rid = int(ids[b, j])
            np.testing.assert_allclose(dists[b, j], float(q[b] @ x[rid]), rtol=1e-4)


def test_approx_l2_and_filter(rng):
    n, d = 70_000, 32
    x = rng.normal(size=(n, d)).astype(np.float32)
    corpus = DeviceCorpus(d)
    corpus.append(x)
    mask = np.zeros(n, dtype=bool)
    mask[: n // 2] = True
    q = x[5:6]
    dists, ids = corpus.search_approx(q, 10, Metric.L2, filter_mask=mask)
    assert all(i < n // 2 for i in ids[0] if i >= 0)
    assert ids[0, 0] == 5  # the row itself survives the shortlist
