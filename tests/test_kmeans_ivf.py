"""On-TPU k-means + IVF/SPANN index tests (recall sanity mirrors the
reference's per-index tests, e.g. ivf.rs:578)."""

import numpy as np
import pytest

from lynsedb_tpu.ops.kmeans import train_kmeans


def _clustered_data(rng, n_clusters=8, per=200, d=16, spread=0.05):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 3
    data = np.concatenate(
        [centers[i] + spread * rng.normal(size=(per, d)).astype(np.float32) for i in range(n_clusters)]
    )
    labels = np.repeat(np.arange(n_clusters), per)
    return data.astype(np.float32), labels, centers


def test_kmeans_recovers_clusters(rng):
    data, labels, centers = _clustered_data(rng)
    centroids, assigns = train_kmeans(data, 8, seed=7)
    assert centroids.shape == (8, 16)
    # every true cluster should map to exactly one learned centroid
    for c in range(8):
        cluster_assigns = assigns[labels == c]
        dominant = np.bincount(cluster_assigns).max()
        assert dominant / len(cluster_assigns) > 0.95


def test_kmeans_deterministic(rng):
    data, _, _ = _clustered_data(rng, n_clusters=4, per=100)
    c1, a1 = train_kmeans(data, 4, seed=3)
    c2, a2 = train_kmeans(data, 4, seed=3)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_allclose(c1, c2, rtol=1e-6)


def _recall(got_ids, want_ids):
    got = set(int(i) for i in got_ids if i >= 0)
    want = set(int(i) for i in want_ids)
    return len(got & want) / max(len(want), 1)


@pytest.fixture
def ivf_collection(db, rng):
    n, d = 5000, 32
    data = rng.normal(size=(n, d)).astype(np.float32)
    coll = db.require_collection("ivf", dim=d, drop_if_exists=True, default_index=None)
    coll.add(list(range(n)), vectors=data)
    coll.commit()
    return coll, data


def test_ivf_recall_improves_with_nprobe(ivf_collection, rng):
    coll, data = ivf_collection
    coll.build_index("IVF-L2", n_clusters=32)
    q = rng.normal(size=(10, 32)).astype(np.float32)
    want = np.argsort(((data[None] - q[:, None]) ** 2).sum(-1), axis=1)[:, :10]

    def recall_at(nprobe):
        total = 0.0
        for i in range(len(q)):
            res = coll.search(q[i], k=10, nprobe=nprobe)
            total += _recall(res.ids, want[i])
        return total / len(q)

    r_small = recall_at(1)
    r_big = recall_at(32)
    assert r_big >= r_small
    assert r_big >= 0.99  # probing every partition is exact
    # random gaussian data has no cluster structure; 1/4 of the partitions
    # still has to beat 1 partition and clear a coarse floor
    r_mid = recall_at(8)
    assert r_mid >= r_small
    assert r_mid >= 0.5


def test_ivf_ip_mode(ivf_collection, rng):
    coll, data = ivf_collection
    coll.build_index("IVF-IP", n_clusters=16)
    q = rng.normal(size=(32,)).astype(np.float32)
    res = coll.search(q, k=10, nprobe=16)
    want = np.argsort(-(data @ q))[:10]
    assert _recall(res.ids, want) >= 0.99
    # distances are descending for IP
    assert all(res.distances[i] >= res.distances[i + 1] for i in range(len(res.distances) - 1))


def test_spann_replicas_dedup(ivf_collection, rng):
    coll, data = ivf_collection
    coll.build_index("SPANN-L2", n_clusters=16, replica_count=2)
    q = rng.normal(size=(32,)).astype(np.float32)
    res = coll.search(q, k=10, nprobe=4)
    ids = res.ids.tolist()
    assert len(ids) == len(set(ids))  # replicas must not duplicate results
    want = np.argsort(((data - q) ** 2).sum(-1))[:10]
    assert _recall(res.ids, want) >= 0.6


def test_ivf_filtered_search(ivf_collection, rng):
    coll, data = ivf_collection
    coll.build_index("IVF-L2", n_clusters=16)
    # broad filter (one half) still routes through IVF; results must respect it
    coll2_ids = coll.search(data[7], k=5, where=None, nprobe=16).ids
    assert 7 in coll2_ids.tolist()


def test_ivf_incremental_adds_visible(db, rng):
    d = 16
    data = rng.normal(size=(2000, d)).astype(np.float32)
    coll = db.require_collection("ivf_inc", dim=d, drop_if_exists=True, default_index=None)
    coll.add(list(range(2000)), vectors=data)
    coll.commit()
    coll.build_index("IVF-L2", n_clusters=16)
    new = rng.normal(size=(5, d)).astype(np.float32) + 10.0
    coll.add([9000 + i for i in range(5)], vectors=new)
    coll.commit()
    res = coll.search(new[3], k=1, nprobe=4)
    assert res.ids[0] == 9003  # tail rows are exactly scanned


def test_ivf_persists_across_reopen(db, rng, tmp_root):
    import lynsedb_tpu as lynse

    d = 16
    data = rng.normal(size=(1000, d)).astype(np.float32)
    coll = db.require_collection("ivf_persist", dim=d, drop_if_exists=True, default_index=None)
    coll.add(list(range(1000)), vectors=data)
    coll.commit()
    coll.build_index("IVF-L2", n_clusters=8)
    res1 = coll.search(data[5], k=3, nprobe=8)

    client2 = lynse.VectorDBClient(tmp_root + "_2")
    db2 = client2.create_database("x", drop_if_exists=True)
    # reopen within the same process via a fresh engine object
    from lynsedb_tpu.engine.collection import Collection

    eng = Collection(coll._engine.root, "ivf_persist")
    assert eng.index_mode == "IVF-L2"
    assert eng._index is not None
    client2.close()


def test_index_mode_validation(db, rng):
    coll = db.require_collection("val", dim=8, drop_if_exists=True, default_index=None)
    coll.add([0], vectors=[np.ones(8, dtype=np.float32)])
    coll.commit()
    with pytest.raises(Exception):
        coll.build_index("IVF-HELLINGER")  # domain metrics are FLAT/HNSW only
    with pytest.raises(Exception):
        coll.build_index("NOPE-L2")
    with pytest.raises(Exception):
        coll.build_index("IVF-L2", bogus_param=3)
    with pytest.raises(Exception):
        coll.build_index("IVF-L2", n_clusters=0)


def test_ivf_incremental_insert_no_rebuild(db, rng):
    """Rows added after build join postings by nearest-centroid assignment
    (reference: ivf.rs incremental insert) — no k-means retrain, new rows
    served through the partition path with good recall."""
    n0, d, k = 4000, 16, 10
    base = rng.normal(size=(n0, d)).astype(np.float32)
    coll = db.require_collection("ivf_inc", dim=d, drop_if_exists=True)
    coll.add(list(range(n0)), vectors=base)
    coll.commit()
    coll.build_index("IVF-L2", n_clusters=32)
    idx = coll._engine._index
    rebuilds = {"n": 0}
    orig = idx.rebuild
    idx.rebuild = lambda c: (rebuilds.__setitem__("n", rebuilds["n"] + 1), orig(c))

    fresh = rng.normal(size=(1200, d)).astype(np.float32)
    coll.add(list(range(n0, n0 + 1200)), vectors=fresh)
    coll.commit()
    assert rebuilds["n"] == 0
    assert idx.built_rows == n0 + 1200  # postings cover the new rows
    assert idx.postings[:, 1].max() == n0 + 1199

    allv = np.concatenate([base, fresh])
    hits = 0
    queries = rng.normal(size=(15, d)).astype(np.float32)
    for q in queries:
        want = set(np.argsort(((allv - q) ** 2).sum(1))[:k].tolist())
        res = coll.search(q, k=k, nprobe=16)
        hits += len(set(int(x) for x in res.ids) & want)
    assert hits / (15 * k) >= 0.85

    # growth past 50% of the trained corpus triggers the retrain backstop
    more = rng.normal(size=(1500, d)).astype(np.float32)
    coll.add(list(range(n0 + 1200, n0 + 2700)), vectors=more)
    coll.commit()
    assert rebuilds["n"] == 1
