"""Multi-chip data-plane tests on a virtual CPU mesh.

conftest forces an 8-virtual-device CPU platform, so these exercise the real
shard_map sharding/collective code paths (corpus sharded over "corpus",
query batch over "data") without TPU hardware — the same contract the
reference's cluster read fan-out provides (reference: src/cluster.rs:25,327).
"""

import jax
import numpy as np
import pytest

from lynsedb_tpu.metrics import Metric
from lynsedb_tpu.parallel.mesh import (
    make_mesh,
    shard_corpus,
    shard_queries,
    sharded_kmeans_step_fn,
    sharded_search_fn,
)


def _reference_topk(corpus, queries, valid, metric, k):
    """Single-host numpy ground truth (oriented best-first)."""
    if metric is Metric.IP:
        scores = queries @ corpus.T
        keyed = scores
    elif metric is Metric.L2:
        scores = ((queries[:, None, :] - corpus[None, :, :]) ** 2).sum(-1)
        keyed = -scores
    else:
        raise AssertionError(metric)
    keyed = np.where(valid[None, :], keyed, -np.inf)
    order = np.argsort(-keyed, axis=1, kind="stable")[:, :k]
    return order


def _run_search(n_devices, data_axis, n, b, k=5, metric=Metric.IP, tombstones=None):
    mesh = make_mesh(n_devices, data_axis=data_axis, platform="cpu")
    rng = np.random.default_rng(7)
    d = 16
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    if tombstones is not None:
        valid[tombstones] = False

    xs, vs = shard_corpus(mesh, corpus, valid)
    qs, b_real = shard_queries(mesh, queries)
    search = sharded_search_fn(mesh, metric=metric, k=k)
    dists, ids = search(xs, qs, vs)
    dists, ids = np.asarray(dists)[:b_real], np.asarray(ids)[:b_real]

    want = _reference_topk(corpus, queries, valid, metric, k)
    assert ids.shape == (b, k)
    for row in range(b):
        assert set(ids[row].tolist()) == set(want[row].tolist()), (
            f"row {row}: got {sorted(ids[row])}, want {sorted(want[row])}"
        )
    return dists, ids


@pytest.mark.parametrize("n_devices,data_axis", [(2, 1), (4, 1), (4, 2), (8, 2), (8, 1)])
def test_sharded_search_matches_single_host(n_devices, data_axis):
    _run_search(n_devices, data_axis, n=256, b=4)


def test_sharded_search_odd_remainder():
    # 251 rows over 4 shards: padding rows must never appear in results
    _run_search(4, 1, n=251, b=3, k=7)


def test_sharded_search_odd_query_batch():
    # 5 queries over data_axis=2: query padding trimmed from outputs
    _run_search(8, 2, n=128, b=5, k=3)


def test_sharded_search_tombstones():
    rng = np.random.default_rng(0)
    tomb = rng.choice(200, size=60, replace=False)
    d, ids = _run_search(4, 1, n=200, b=4, k=5, tombstones=tomb)
    assert not (set(ids.ravel().tolist()) & set(int(t) for t in tomb))


def test_sharded_search_l2_metric():
    _run_search(4, 2, n=192, b=4, metric=Metric.L2)


def test_sharded_search_k_larger_than_shard():
    # k=40 with 64 rows over 8 shards (8 rows/shard): per-shard top-k is
    # capped at the shard size; the merge must still produce the global top-k
    _run_search(8, 1, n=64, b=2, k=40)


def test_sharded_kmeans_step_matches_single_host():
    mesh = make_mesh(8, data_axis=2, platform="cpu")
    rng = np.random.default_rng(3)
    n, d, kc = 300, 8, 6
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[::9] = False
    centroids = corpus[:kc].copy()

    xs, vs = shard_corpus(mesh, corpus, valid)
    step = sharded_kmeans_step_fn(mesh)
    new_c, counts = step(xs, jax.numpy.asarray(centroids), vs)
    new_c, counts = np.asarray(new_c), np.asarray(counts)

    # single-host reference Lloyd step
    d2 = ((corpus[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    assign = d2.argmin(1)
    ref_c = centroids.copy()
    ref_counts = np.zeros(kc)
    for j in range(kc):
        m = (assign == j) & valid
        ref_counts[j] = m.sum()
        if m.any():
            ref_c[j] = corpus[m].mean(0)
    assert counts.sum() == valid.sum()
    np.testing.assert_allclose(counts, ref_counts)
    np.testing.assert_allclose(new_c, ref_c, rtol=1e-5, atol=1e-5)


def test_make_mesh_explicit_devices():
    cpus = jax.devices("cpu")
    mesh = make_mesh(4, data_axis=2, devices=cpus)
    assert dict(mesh.shape) == {"data": 2, "corpus": 2}
    with pytest.raises(ValueError):
        make_mesh(len(cpus) + 1, devices=cpus)


# ── engine integration: a Collection serving from a sharded corpus ────────


@pytest.fixture
def mesh8():
    from lynsedb_tpu.parallel.mesh import set_default_mesh

    mesh = make_mesh(8, data_axis=1, platform="cpu")
    set_default_mesh(mesh)
    yield mesh
    set_default_mesh(None)


def test_collection_on_mesh_crud_parity(tmp_path, mesh8):
    """A Collection whose DeviceCorpus shards rows over the mesh must give
    the same results as the single-device engine for add/search/filter/
    delete (XLA SPMD inserts the cross-shard top-k merge)."""
    import lynsedb_tpu as lynse
    from lynsedb_tpu.parallel.mesh import set_default_mesh

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(500, 12)).astype(np.float32)
    fields = [{"b": i % 3} for i in range(500)]

    client = lynse.VectorDBClient(str(tmp_path / "mesh_root"))
    db = client.create_database("d", drop_if_exists=True)
    coll = db.require_collection("c", dim=12, drop_if_exists=True)
    assert coll._engine.corpus().mesh is mesh8
    coll.add(list(range(500)), vectors=vecs, fields=fields)
    coll.commit()

    # single-device twin
    set_default_mesh(None)
    db2 = client.create_database("d2", drop_if_exists=True)
    ref = db2.require_collection("c", dim=12, drop_if_exists=True)
    ref.add(list(range(500)), vectors=vecs, fields=fields)
    ref.commit()
    set_default_mesh(mesh8)

    q = vecs[17]
    a = coll.search(q, k=7)
    b = ref.search(q, k=7)
    assert a.ids.tolist() == b.ids.tolist()
    np.testing.assert_allclose(a.distances, b.distances, rtol=1e-5)

    af = coll.search(q, k=7, where="b = 1")
    bf = ref.search(q, k=7, where="b = 1")
    assert af.ids.tolist() == bf.ids.tolist()

    coll.delete([17])
    ref.delete([17])
    a2 = coll.search(q, k=7)
    b2 = ref.search(q, k=7)
    assert a2.ids.tolist() == b2.ids.tolist()

    rs = coll.search_stream(vecs[:10], k=3, window=4)
    assert len(rs) == 10
    live = np.ones(500, dtype=bool)
    live[17] = False  # deleted above
    for qi in (0, 3, 9):
        scores = np.where(live, vecs[qi] @ vecs.T, -np.inf)
        assert int(rs[qi].ids[0]) == int(np.argmax(scores))


def test_device_corpus_mesh_two_pass(mesh8, rng):
    """Sharded two-pass path at a size above TWO_PASS_MIN_ROWS."""
    from lynsedb_tpu.ops.scan import DeviceCorpus

    n, d, k = 8192, 32, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    dc = DeviceCorpus(d)
    assert dc.mesh is mesh8
    dc.append(x)
    q = rng.normal(size=(3, d)).astype(np.float32)
    dists, ids = dc.search(q, k, Metric.IP)
    want = np.argsort(-(q @ x.T), axis=1)[:, :k]
    for b in range(3):
        assert set(ids[b].tolist()) == set(want[b].tolist())


def test_quantized_index_on_mesh_parity(tmp_path, mesh8):
    """Quantized aux search over a sharded corpus: per-row state arrays
    (codes/row_sq) shard over the corpus axis alongside the bf16 scan copy,
    per-dim params replicate — the fused shortlist+rescore chain must
    compile under GSPMD and match the single-device engine."""
    import lynsedb_tpu as lynse
    from lynsedb_tpu.parallel.mesh import set_default_mesh

    rng = np.random.default_rng(23)
    vecs = rng.random((800, 16), dtype=np.float32)

    client = lynse.VectorDBClient(str(tmp_path / "mesh_q"))
    db = client.create_database("d", drop_if_exists=True)
    coll = db.require_collection("c", dim=16, drop_if_exists=True,
                                 default_index=None)
    assert coll._engine.corpus().mesh is mesh8
    coll.add(list(range(800)), vectors=vecs)
    coll.commit()
    coll.build_index("FLAT-IP-SQ8")

    set_default_mesh(None)
    db2 = client.create_database("d2", drop_if_exists=True)
    ref = db2.require_collection("c", dim=16, drop_if_exists=True,
                                 default_index=None)
    ref.add(list(range(800)), vectors=vecs)
    ref.commit()
    ref.build_index("FLAT-IP-SQ8")
    set_default_mesh(mesh8)

    for qi in (3, 99, 512):
        a = coll.search(vecs[qi], k=5)
        b = ref.search(vecs[qi], k=5)
        assert a.ids.tolist() == b.ids.tolist()
        np.testing.assert_allclose(a.distances, b.distances, rtol=1e-5)
