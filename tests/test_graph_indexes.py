"""DiskANN / HNSW graph index tests — recall floors mirror the reference
gates (HNSW/DiskANN >= 0.90, gate_index_modes.py:269)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lynsedb_tpu.metrics import Metric
from lynsedb_tpu.ops.graph import beam_search, build_vamana, exact_knn_graph


def _recall(got, want):
    g = set(int(i) for i in np.asarray(got).ravel() if i >= 0)
    w = set(int(i) for i in want)
    return len(g & w) / max(len(w), 1)


def test_exact_knn_graph(rng):
    x = rng.normal(size=(50, 8)).astype(np.float32)
    g = exact_knn_graph(jnp.asarray(x), Metric.L2, 5)
    assert g.shape == (50, 5)
    d = ((x[:, None] - x[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    want = np.argsort(d, axis=1)[:, :5]
    assert np.array_equal(np.sort(g, axis=1), np.sort(want, axis=1))


def test_exact_knn_graph_blockwise_matches_single_block(rng):
    # the ragged-tail padded block path must agree with the one-block path
    x = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    one = exact_knn_graph(x, Metric.IP, 6, block=64)
    blocked = exact_knn_graph(x, Metric.IP, 6, block=16)
    assert np.array_equal(one, blocked)


def test_beam_search_on_exact_graph(rng):
    n, d = 500, 16
    x = rng.normal(size=(n, d)).astype(np.float32)
    graph = exact_knn_graph(jnp.asarray(x), Metric.L2, 12)
    q = rng.normal(size=(4, d)).astype(np.float32)
    keys, ids, _scanned = beam_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(graph),
        jnp.asarray([0], dtype=jnp.int32), jnp.ones(n, dtype=bool),
        metric=Metric.L2, beam=48, max_steps=96, k=10,
    )
    ids = np.asarray(ids)
    want = np.argsort(((x[None] - q[:, None]) ** 2).sum(-1), axis=1)[:, :10]
    total = sum(_recall(ids[i], want[i]) for i in range(4)) / 4
    assert total >= 0.9


def test_vamana_build_and_search(rng):
    n, d = 2000, 24
    x = rng.normal(size=(n, d)).astype(np.float32)
    graph = build_vamana(jnp.asarray(x), Metric.L2, r=12, l_build=48)
    assert graph.shape == (n, 12)
    assert (graph >= -1).all() and (graph < n).all()
    # no self loops
    assert not any(graph[i].tolist().count(i) for i in range(0, n, 97))
    q = rng.normal(size=(8, d)).astype(np.float32)
    keys, ids, _scanned = beam_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(graph),
        jnp.asarray([0], dtype=jnp.int32), jnp.ones(n, dtype=bool),
        metric=Metric.L2, beam=64, max_steps=128, k=10,
    )
    ids = np.asarray(ids)
    want = np.argsort(((x[None] - q[:, None]) ** 2).sum(-1), axis=1)[:, :10]
    total = sum(_recall(ids[i], want[i]) for i in range(8)) / 8
    assert total >= 0.9, f"vamana recall {total:.3f}"


@pytest.fixture(scope="module")
def graph_data():
    rng = np.random.default_rng(5)
    n, d = 3000, 32
    data = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(6, d)).astype(np.float32)
    return data, queries


@pytest.mark.parametrize("mode,kw", [
    ("DISKANN-L2", {}),
    ("DISKANN-IP", {}),
    ("HNSW-L2", {"m": 16}),
    ("HNSW-COS", {}),
])
def test_graph_index_recall(db, graph_data, mode, kw):
    data, queries = graph_data
    name = "g_" + mode.replace("-", "_").lower()
    coll = db.require_collection(name, dim=32, drop_if_exists=True, default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index(mode, **kw)
    metric = Metric.from_index_mode(mode)
    if metric is Metric.L2:
        want = np.argsort(((data[None] - queries[:, None]) ** 2).sum(-1), axis=1)[:, :10]
    elif metric is Metric.IP:
        want = np.argsort(-(queries @ data.T), axis=1)[:, :10]
    else:  # cosine
        dn = data / np.linalg.norm(data, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        want = np.argsort(-(qn @ dn.T), axis=1)[:, :10]
    total = 0.0
    for i in range(len(queries)):
        res = coll.search(queries[i], k=10, nprobe=80)
        total += _recall(res.ids, want[i])
    recall = total / len(queries)
    assert recall >= 0.9, f"{mode} recall {recall:.3f}"


def test_graph_index_filtered_and_deletes(db, graph_data):
    data, queries = graph_data
    coll = db.require_collection("g_filt", dim=32, drop_if_exists=True, default_index=None)
    coll.add(list(range(len(data))), vectors=data,
             fields=[{"b": i % 2} for i in range(len(data))])
    coll.commit()
    coll.build_index("DISKANN-L2")
    # selective filter falls back to exact scan; results respect it
    res = coll.search(queries[0], k=20, where="b = 1")
    assert all(i % 2 == 1 for i in res.ids.tolist())
    # deletes disappear
    target = int(np.argmin(((data - queries[1]) ** 2).sum(-1)))
    coll.delete([target])
    res = coll.search(queries[1], k=5, nprobe=64)
    assert target not in res.ids.tolist()


def test_graph_index_persist_and_tail(db, graph_data, rng):
    data, queries = graph_data
    coll = db.require_collection("g_persist", dim=32, drop_if_exists=True, default_index=None)
    coll.add(list(range(1000)), vectors=data[:1000])
    coll.commit()
    coll.build_index("HNSW-L2")
    # tail rows visible without rebuild
    new = rng.normal(size=(1, 32)).astype(np.float32) + 9.0
    coll.add([7777], vectors=new)
    coll.commit()
    res = coll.search(new[0], k=1)
    assert res.ids[0] == 7777
    # reload from disk
    from lynsedb_tpu.engine.collection import Collection

    eng = Collection(coll._engine.root, "g_persist")
    assert eng._index is not None and eng._index.kind == "hnsw"
    d2, i2 = eng._index.search(eng, queries[:1], 5, mask=None, nprobe=64)
    assert i2.shape[1] == 5
    eng.close()


def test_diskann_in_place_updates_hold_recall(db, rng):
    """30% churn (deletes + inserts in waves) must hold recall@10 >= 0.9
    WITHOUT a full rebuild (reference: test_diskann_ip_updates.py;
    IP-DiskANN in-place repair diskann.rs:1337/:1496)."""
    n0, d, k = 1500, 24, 10
    base = rng.normal(size=(n0, d)).astype(np.float32)
    coll = db.require_collection("dia_upd", dim=d, drop_if_exists=True)
    coll.add(list(range(n0)), vectors=base)
    coll.commit()
    coll.build_index("DISKANN-L2", r=16, l=40)
    eng = coll._engine
    idx = eng._index
    assert idx is not None and idx.kind == "diskann"

    rebuilds = {"n": 0}
    orig_rebuild = idx.rebuild
    idx.rebuild = lambda c: (rebuilds.__setitem__("n", rebuilds["n"] + 1), orig_rebuild(c))

    # churn in 3 waves: delete 150 + insert 150 each (30% total)
    next_id = n0
    all_vecs = {i: base[i] for i in range(n0)}
    deleted = set()
    for wave in range(3):
        dead = rng.choice([i for i in sorted(all_vecs) if i not in deleted], size=150, replace=False)
        coll.delete([int(x) for x in dead])
        deleted.update(int(x) for x in dead)
        fresh = rng.normal(size=(150, d)).astype(np.float32)
        ids = list(range(next_id, next_id + 150))
        coll.add(ids, vectors=fresh)
        for j, i in enumerate(ids):
            all_vecs[i] = fresh[j]
        next_id += 150
        coll.commit()  # triggers in-place repair + insert

    assert rebuilds["n"] == 0, "in-place updates must not fall back to rebuild"

    # brute-force ground truth over live rows
    live_ids = np.array([i for i in sorted(all_vecs) if i not in deleted])
    live_mat = np.stack([all_vecs[i] for i in live_ids])
    queries = rng.normal(size=(20, d)).astype(np.float32)
    hits = 0
    for q in queries:
        want = live_ids[np.argsort(((live_mat - q) ** 2).sum(1))[:k]]
        res = coll.search(q, k=k)
        hits += len(set(int(x) for x in res.ids) & set(want.tolist()))
    recall = hits / (len(queries) * k)
    assert recall >= 0.9, f"recall after churn {recall:.3f}"
    # deleted ids never surface
    res = coll.search(queries[0], k=50)
    assert not (set(int(x) for x in res.ids) & deleted)


def test_diskann_medoid_delete_recovers(db, rng):
    d = 8
    vecs = rng.normal(size=(300, d)).astype(np.float32)
    coll = db.require_collection("dia_med", dim=d, drop_if_exists=True)
    coll.add(list(range(300)), vectors=vecs)
    coll.commit()
    coll.build_index("DISKANN-L2", r=8, l=24)
    idx = coll._engine._index
    coll.delete([int(s) for s in idx._starts_np.tolist()])
    coll.commit()
    q = vecs[7]
    res = coll.search(q, k=5)
    assert len(res.ids) == 5
    assert int(idx.medoid) not in [int(x) for x in res.ids]


def test_hnsw_incremental_insert_holds_recall(db, rng):
    """Adding 30% new rows after build must link them into layer 0 in place
    (reference: hnsw.rs:784 insert_point) — no rebuild, recall >= 0.9, new
    rows discoverable through the graph path (not just the tail scan)."""
    n0, d, k = 1200, 16, 10
    base = rng.normal(size=(n0, d)).astype(np.float32)
    coll = db.require_collection("hnsw_upd", dim=d, drop_if_exists=True)
    coll.add(list(range(n0)), vectors=base)
    coll.commit()
    coll.build_index("HNSW-L2", m=12, ef_construction=48)
    idx = coll._engine._index
    rebuilds = {"n": 0}
    orig = idx.rebuild
    idx.rebuild = lambda c: (rebuilds.__setitem__("n", rebuilds["n"] + 1), orig(c))

    fresh = rng.normal(size=(360, d)).astype(np.float32)
    coll.add(list(range(n0, n0 + 360)), vectors=fresh)
    coll.commit()
    assert rebuilds["n"] == 0
    assert idx.built_rows == n0 + 360  # inserted, not tail-scanned

    allv = np.concatenate([base, fresh])
    queries = rng.normal(size=(15, d)).astype(np.float32)
    hits = 0
    for q in queries:
        want = np.argsort(((allv - q) ** 2).sum(1))[:k]
        res = coll.search(q, k=k)
        hits += len(set(int(x) for x in res.ids) & set(int(x) for x in want))
    assert hits / (15 * k) >= 0.9


@pytest.mark.parametrize("tier", ["bf16", "sq8", "pq"])
def test_diskann_layered_pq_beam(db, graph_data, monkeypatch, tier):
    """Layered mode (reference diskann.rs:276/:602): guided beam + exact
    host-mirror rescore. The f32 corpus must never be staged on device, so
    the index keeps working when the corpus exceeds the device budget.
    tier=bf16 is the resident-corpus guidance; tier=sq8 forces the
    streaming middle tier (1 byte/dim codes); tier=pq forces the deepest
    (>HBM) PQ guidance through the same engine path."""
    import lynsedb_tpu.index.diskann as da

    monkeypatch.setattr(da, "LAYERED_MIN_ROWS", 1000)
    data, queries = graph_data
    coll = db.require_collection("g_layered", dim=32, drop_if_exists=True, default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index("DISKANN-L2")
    idx = coll._engine._index
    assert idx.layered and idx.pq_codes.shape == (len(data), idx.pq.m)
    if tier == "pq":
        idx._force_pq = True
    elif tier == "sq8":
        idx._force_sq8 = True
        assert idx.sq8_codes is not None and idx.sq8_codes.shape == data.shape

    corpus = coll._engine.corpus()
    corpus._dev32 = None  # drop anything staged during build
    want = np.argsort(((data[None] - queries[:, None]) ** 2).sum(-1), axis=1)[:, :10]
    total = 0.0
    for i in range(len(queries)):
        res = coll.search(queries[i], k=10, nprobe=80)
        total += _recall(res.ids, want[i])
    recall = total / len(queries)
    assert recall >= 0.9, f"layered recall {recall:.3f}"
    assert corpus._dev32 is None, "layered search must not stage the f32 corpus"
    # distances are exact (host rescore): spot-check vs numpy
    res = coll.search(queries[0], k=3)
    got = ((data[np.asarray(res.ids, dtype=int)] - queries[0]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(res.distances), got, rtol=1e-4)


def test_diskann_layered_insert_and_reload(db, graph_data, rng, monkeypatch):
    import lynsedb_tpu.index.diskann as da

    monkeypatch.setattr(da, "LAYERED_MIN_ROWS", 1000)
    data, queries = graph_data
    coll = db.require_collection("g_layered2", dim=32, drop_if_exists=True, default_index=None)
    coll.add(list(range(2000)), vectors=data[:2000])
    coll.commit()
    coll.build_index("DISKANN-IP")
    # in-place insert keeps the code tier in lockstep
    coll.add(list(range(2000, 2050)), vectors=data[2000:2050])
    coll.commit()
    idx = coll._engine._index
    assert idx.layered and idx.pq_codes.shape[0] == 2050
    probe = data[2049]
    res = coll.search(probe, k=5, nprobe=80)
    assert 2049 in res.ids.tolist()
    # reload from disk keeps layered artifacts
    from lynsedb_tpu.engine.collection import Collection

    eng = Collection(coll._engine.root, "g_layered2")
    assert eng._index is not None and eng._index.layered
    assert eng._index.pq_codes.shape[0] == 2050
    eng.close()


@pytest.mark.parametrize("metric,kind", [
    (Metric.L2, "l2"), (Metric.IP, "ip"), (Metric.COSINE, "cos"),
])
def test_beam_search_bf16_matches_f32_pool(rng, metric, kind):
    """The bf16-guided beam (the resident-corpus guidance tier) must find
    essentially the same neighbors as the f32 beam on the same graph: the
    centered-bf16 proxy + rank-1 corrections preserve ranking (the same
    contract ops/scan's fused flat pass relies on)."""
    from lynsedb_tpu.ops.graph import beam_search_bf16

    n, d = 1500, 32
    x = rng.normal(size=(n, d)).astype(np.float32) + 3.0  # offset: centering matters
    graph = build_vamana(jnp.asarray(x), metric, r=12, l_build=48)
    q = (rng.normal(size=(5, d)) + 3.0).astype(np.float32)
    starts = jnp.asarray([0, 7], dtype=jnp.int32)
    valid = jnp.ones(n, dtype=bool)

    mean = x.mean(axis=0)
    xc = x - mean[None, :]
    x16 = jnp.asarray(xc, dtype=jnp.bfloat16)
    xm = jnp.asarray(xc @ mean)
    xc_sq = jnp.asarray((xc * xc).sum(1))
    xsq_true = jnp.asarray((x * x).sum(1))

    _, pool, scanned = beam_search_bf16(
        jnp.asarray(q), x16, jnp.asarray(mean), xm, xc_sq, xsq_true,
        jnp.asarray(graph), starts, valid,
        metric_kind=kind, beam=48, max_steps=96,
    )
    pool = np.asarray(pool)
    assert (np.asarray(scanned) > 0).all()

    keys32, ids32, _ = beam_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(graph), starts, valid,
        metric=metric, beam=48, max_steps=96, k=10,
    )
    ids32 = np.asarray(ids32)
    # the f32 beam's top-10 must be contained in the bf16 pool (the engine
    # exact-rescores the pool, so containment == equal final results)
    for i in range(5):
        want = set(int(v) for v in ids32[i] if v >= 0)
        got = set(int(v) for v in pool[i] if v >= 0)
        inter = len(want & got) / max(len(want), 1)
        assert inter >= 0.9, f"q{i}: bf16 pool lost f32 winners ({inter:.2f})"


def test_beam_search_bf16_respects_valid_mask(rng):
    from lynsedb_tpu.ops.graph import beam_search_bf16

    n, d = 600, 16
    x = rng.normal(size=(n, d)).astype(np.float32)
    graph = build_vamana(jnp.asarray(x), Metric.L2, r=8, l_build=32)
    q = rng.normal(size=(3, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    valid[::2] = False  # only odd ids allowed
    mean = x.mean(axis=0)
    xc = x - mean[None, :]
    _, pool, _ = beam_search_bf16(
        jnp.asarray(q), jnp.asarray(xc, dtype=jnp.bfloat16), jnp.asarray(mean),
        jnp.asarray(xc @ mean), jnp.asarray((xc * xc).sum(1)),
        jnp.asarray((x * x).sum(1)), jnp.asarray(graph),
        jnp.asarray([1], dtype=jnp.int32), jnp.asarray(valid),
        metric_kind="l2", beam=32, max_steps=64,
    )
    pool = np.asarray(pool)
    live = pool[pool >= 0]
    assert len(live) > 0
    assert (live % 2 == 1).all(), "filtered-out ids leaked into the pool"


def test_hnsw_ip_high_norm_entry_starts(db, rng):
    """HNSW-IP appends fixed high-norm entry points to the descended entry
    (MIPS winners concentrate at large norms; the single greedy-descent
    entry alone can strand the beam in a low-norm angular neighborhood).
    The starts must survive save/load."""
    n, d = 2500, 24
    data = rng.normal(size=(n, d)).astype(np.float32)
    # plant a distinct high-norm cluster that IP queries must find
    data[:30] *= 8.0
    coll = db.require_collection("g_ipstarts", dim=d, drop_if_exists=True,
                                 default_index=None)
    coll.add(list(range(n)), vectors=data)
    coll.commit()
    coll.build_index("HNSW-IP")
    idx = coll._engine._index
    assert len(idx.ip_starts) > 0
    norms = np.linalg.norm(data, axis=1)
    assert set(idx.ip_starts.tolist()) <= set(np.argsort(-norms)[:8].tolist())
    queries = rng.normal(size=(6, d)).astype(np.float32)
    want = np.argsort(-(queries @ data.T), axis=1)[:, :10]
    total = sum(
        _recall(coll.search(queries[i], k=10, nprobe=80).ids, want[i])
        for i in range(len(queries))
    ) / len(queries)
    assert total >= 0.9, f"HNSW-IP recall {total:.3f}"
    # reload from disk keeps the starts
    from lynsedb_tpu.index.hnsw import HNSWIndex
    loaded = HNSWIndex.load(coll._engine, idx.mode, idx)
    assert np.array_equal(loaded.ip_starts, idx.ip_starts)


def test_hnsw_l2_has_no_ip_starts(db, rng):
    n, d = 600, 16
    data = rng.normal(size=(n, d)).astype(np.float32)
    coll = db.require_collection("g_l2starts", dim=d, drop_if_exists=True,
                                 default_index=None)
    coll.add(list(range(n)), vectors=data)
    coll.commit()
    coll.build_index("HNSW-L2")
    assert len(coll._engine._index.ip_starts) == 0


def test_graph_search_on_streaming_corpus(db, graph_data, monkeypatch):
    """A corpus whose bf16 footprint exceeds the HBM budget streams; graph
    indexes must keep serving: DiskANN builds (or lazily fits) the PQ tier
    even below LAYERED_MIN_ROWS, HNSW falls back to the exact streaming
    scan. Regression: both previously raised 'f32 device copy unavailable'
    on streaming corpora below the layered threshold."""
    import lynsedb_tpu.ops.scan as scan_mod

    data, queries = graph_data  # 3000 x 32 bf16 = 187.5 KB
    monkeypatch.setattr(scan_mod, "HBM_BYTES", 64 * 1024)
    coll = db.require_collection("g_stream", dim=32, drop_if_exists=True,
                                 default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index("DISKANN-IP")
    idx = coll._engine._index
    assert idx.layered, "streaming-corpus build must fit the PQ tier"
    want = np.argsort(-(queries @ data.T), axis=1)[:, :10]
    total = sum(
        _recall(coll.search(queries[i], k=10, nprobe=80).ids, want[i])
        for i in range(len(queries))
    ) / len(queries)
    assert coll._engine.corpus().streaming  # staged lazily by the search
    assert total >= 0.9, f"streaming DISKANN-IP recall {total:.3f}"

    # HNSW on the same streaming corpus: exact-scan fallback
    coll.build_index("HNSW-L2")
    want_l2 = np.argsort(((data[None] - queries[:, None]) ** 2).sum(-1), axis=1)[:, :10]
    total = sum(
        _recall(coll.search(queries[i], k=10, nprobe=80).ids, want_l2[i])
        for i in range(len(queries))
    ) / len(queries)
    assert total >= 0.999, f"streaming HNSW fallback recall {total:.3f}"


def test_diskann_legacy_resident_index_lazy_pq_on_stream(db, graph_data, monkeypatch):
    """An index built resident (no PQ codes) must lazily fit + persist the
    PQ tier the first time it searches a corpus that now streams."""
    import lynsedb_tpu.index.diskann as da
    import lynsedb_tpu.ops.scan as scan_mod

    data, queries = graph_data
    coll = db.require_collection("g_lazy", dim=32, drop_if_exists=True,
                                 default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index("DISKANN-IP")
    idx = coll._engine._index
    assert not idx.layered
    # corpus now exceeds the (shrunk) budget: restage as streaming
    monkeypatch.setattr(scan_mod, "HBM_BYTES", 64 * 1024)
    corpus = coll._engine.corpus()
    corpus._dirty = True
    corpus._dirty_lo = 0
    want = np.argsort(-(queries @ data.T), axis=1)[:, :10]
    total = sum(
        _recall(coll.search(queries[i], k=10, nprobe=80).ids, want[i])
        for i in range(len(queries))
    ) / len(queries)
    assert idx.layered, "search on a streaming corpus must lazily fit PQ"
    assert total >= 0.9, f"lazy-PQ recall {total:.3f}"
    # the fitted tier persisted
    from lynsedb_tpu.index.diskann import DiskANNIndex
    loaded = DiskANNIndex.load(coll._engine, idx.mode, idx)
    assert loaded.layered


@pytest.mark.parametrize("expand", [2, 4])
def test_beam_search_multi_expand(rng, expand):
    """The expand>1 lockstep path (top-E expansion + E-way cross-parent
    dedup) must return duplicate-free pools with near-single-expansion
    recall; only reachable via the expand kwarg / LYNSE_TPU_BEAM_EXPAND."""
    n, d = 800, 16
    x = rng.normal(size=(n, d)).astype(np.float32)
    graph = exact_knn_graph(jnp.asarray(x), Metric.L2, 12)
    q = rng.normal(size=(6, d)).astype(np.float32)
    keys, ids, scanned = beam_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(graph),
        jnp.asarray([0], dtype=jnp.int32), jnp.ones(n, dtype=bool),
        metric=Metric.L2, beam=48, max_steps=96, k=10, expand=expand,
    )
    ids = np.asarray(ids)
    for row in ids:
        real = row[row >= 0]
        assert len(real) == len(set(real.tolist())), "duplicate pool ids"
    want = np.argsort(((x[None] - q[:, None]) ** 2).sum(-1), axis=1)[:, :10]
    total = sum(_recall(ids[i], want[i]) for i in range(len(q))) / len(q)
    assert total >= 0.8, f"expand={expand} recall {total:.3f}"


def test_beam_expand_global_not_trace_bound(rng, monkeypatch):
    """BEAM_EXPAND is resolved eagerly in the un-jitted wrappers: changing
    the module global after a kernel has traced must take effect (a stale
    executable keyed on the old value must not be silently reused)."""
    from lynsedb_tpu.ops import graph as G
    n, d = 300, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    graph = exact_knn_graph(jnp.asarray(x), Metric.L2, 8)
    q = jnp.asarray(rng.normal(size=(2, d)).astype(np.float32))
    args = (q, jnp.asarray(x), jnp.asarray(graph),
            jnp.asarray([0], dtype=jnp.int32), jnp.ones(n, dtype=bool))
    kw = dict(metric=Metric.L2, beam=16, max_steps=8, k=5)
    monkeypatch.setattr(G, "BEAM_EXPAND", 1)
    _, _, scanned1 = G.beam_search(*args, **kw)
    monkeypatch.setattr(G, "BEAM_EXPAND", 4)
    _, _, scanned4 = G.beam_search(*args, **kw)
    # 4-way expansion visits strictly more nodes in the same 8 bounded steps
    assert int(np.asarray(scanned4).sum()) > int(np.asarray(scanned1).sum())


def test_entry_sample_ids_fixed_shape_and_band_coverage(rng):
    """entry_sample_ids must (a) return a size that depends only on
    (n, sample, norm_top) — NOT on how the random sample overlaps the norm
    band — so the jitted entry_scan never recompiles across commits at the
    same capacity, and (b) cover the top-norm band exactly."""
    from lynsedb_tpu.ops.graph import entry_sample_ids
    n, sample, top = 50_000, 16_384, 4_096
    sizes = set()
    for seed in (1234, 99, 7):
        sq = rng.normal(size=n).astype(np.float32) ** 2
        ids = entry_sample_ids(n, sample, sq_norms=sq, norm_top=top,
                               seed=seed)
        assert len(ids) == len(np.unique(ids))
        band = np.argpartition(-sq, top - 1)[:top]
        assert np.isin(band, ids).all(), "top-norm band not fully covered"
        sizes.add(len(ids))
    assert sizes == {sample + top}
    # small-n fallbacks: whole corpus below sample; all-rows when the
    # complement is smaller than the requested sample
    assert np.array_equal(entry_sample_ids(1000, sample), np.arange(1000))
    sq = rng.normal(size=17_000).astype(np.float32) ** 2
    assert len(entry_sample_ids(17_000, sample, sq_norms=sq, norm_top=top)) == 17_000


def test_graph_on_commit_on_streaming_corpus(db, graph_data, monkeypatch):
    """Writes must keep working when the corpus exceeds the HBM budget:
    DiskANN links new rows IN PLACE via the PQ tier (candidate discovery on
    the device codes, exact prune over host-gathered candidate rows only —
    reference IP-DiskANN inserts against the on-disk graph the same way,
    diskann.rs:1496); HNSW defers linking entirely (its streaming search is
    the exact scan). Regression: both previously crashed commit with
    'corpus bf16 footprint exceeds the device HBM budget'."""
    import lynsedb_tpu.ops.scan as scan_mod

    data, queries = graph_data
    coll = db.require_collection("g_stream_commit", dim=32,
                                 drop_if_exists=True, default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index("DISKANN-IP")
    idx = coll._engine._index

    monkeypatch.setattr(scan_mod, "HBM_BYTES", 64 * 1024)
    coll._engine._corpus = None  # force re-staging under the tiny budget
    rng2 = np.random.default_rng(9)
    tail = (rng2.normal(size=(20, 32)) + 3.0).astype(np.float32)  # hot norms
    base = len(data)
    coll.add(list(range(base, base + 20)), vectors=tail)
    coll.commit()  # previously raised ValueError here
    assert coll._engine.corpus().would_stream()
    assert idx.built_rows == base + 20
    # linked in place: no pinned backlog, real forward edges, and every new
    # row is reachable (at least one in-edge — the walk can find it)
    assert len(idx._unlinked_ids) == 0
    assert (idx.graph_np[base:base + 20] >= 0).any(axis=1).all()
    flat = idx.graph_np[idx.graph_np >= 0]
    assert np.isin(np.arange(base, base + 20), flat).all(), \
        "streaming-linked rows must have in-edges"
    # new rows are searchable while streaming
    res = coll.search(tail[3], k=5, nprobe=80)
    want = np.argsort(-(np.concatenate([data, tail]) @ tail[3]))[:5]
    got = {int(i) for i in res.ids}
    assert len(got & set(want.tolist())) >= 4, (sorted(got), want)

    # HNSW: streaming commit defers, resident commit catches up
    coll2 = db.require_collection("h_stream_commit", dim=32,
                                  drop_if_exists=True, default_index=None)
    coll2.add(list(range(len(data))), vectors=data)
    coll2.commit()
    coll2.build_index("HNSW-L2")
    hidx = coll2._engine._index
    monkeypatch.setattr(scan_mod, "HBM_BYTES", 64 * 1024)
    coll2._engine._corpus = None
    coll2.add(list(range(base, base + 10)), vectors=tail[:10])
    coll2.commit()  # previously raised
    assert hidx.built_rows == base  # deferred
    res = coll2.search(tail[2], k=3)  # exact streaming fallback sees the tail
    assert int(res.ids[0]) == base + 2
    monkeypatch.setattr(scan_mod, "HBM_BYTES", 16 * 1024**3)
    coll2._engine._corpus = None
    coll2.add([base + 10], vectors=tail[10:11])
    coll2.commit()
    assert hidx.built_rows == base + 11


def test_diskann_unlinked_rows_exact_for_any_k(db, graph_data):
    """Rows that remain UNLINKED (read-only legacy loads, where streaming
    linking can't run) must be returned exactly for ANY k — entry-sample
    pinning alone only reaches the entry scan's top-ENTRY_TOP of them, which
    silently under-returns for k > ENTRY_TOP. The search-side exact merge
    closes that."""
    data, _ = graph_data
    rng = np.random.default_rng(17)
    target = rng.normal(size=(1, 32)).astype(np.float32)
    # 24 rows clustered tightly around the query (> ENTRY_TOP = 16)
    hot = (target + 0.01 * rng.normal(size=(24, 32)) + 0.5).astype(np.float32)
    allv = np.concatenate([data, hot])
    coll = db.require_collection("g_unlinked_k", dim=32,
                                 drop_if_exists=True, default_index=None)
    coll.add(list(range(len(allv))), vectors=allv)
    coll.commit()
    coll.build_index("DISKANN-IP")
    idx = coll._engine._index
    # simulate a legacy unlinked tail: cut the hot rows out of the graph
    sel = np.arange(len(data), len(allv), dtype=np.int64)
    idx.graph_np[sel] = -1
    idx.graph_np[np.isin(idx.graph_np, sel)] = -1
    idx._unlinked_ids = sel
    idx._graph_dev = None
    idx._entry_dev = None
    want = set(np.argsort(-(allv @ target[0]))[:24].tolist())
    res = coll.search(target[0], k=24)
    got = set(int(i) for i in res.ids)
    assert got == want, (sorted(got - want), sorted(want - got))


def test_diskann_rebuild_clears_unlinked(db, graph_data):
    """rebuild() (including the compact() path, which remaps internal ids)
    must not leak stale _unlinked_ids into the fresh index — stale ids
    would crash or corrupt the next commit."""
    data, _ = graph_data
    coll = db.require_collection("g_rebuild_unl", dim=32,
                                 drop_if_exists=True, default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index("DISKANN-IP")
    idx = coll._engine._index
    idx._unlinked_ids = np.asarray([10_000_000], dtype=np.int64)  # stale
    idx.rebuild(coll._engine)
    idx2 = coll._engine._index
    assert len(idx2._unlinked_ids) == 0
    # and a follow-up commit must not crash on the (cleared) ids
    coll.add([len(data)], vectors=data[:1] + 0.01)
    coll.commit()


def test_diskann_resident_relink_of_legacy_backlog(db, graph_data):
    """A legacy index loaded with an 'unlinked' backlog (rows committed by
    an older build while the corpus streamed) must get real adjacency on
    the next RESIDENT commit via the insert_points branch — and the
    backlog must clear so search stops paying the exact-merge tax."""
    data, _ = graph_data
    coll = db.require_collection("g_resident_relink", dim=32,
                                 drop_if_exists=True, default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index("DISKANN-IP")
    idx = coll._engine._index
    # simulate the legacy on-disk state: last 12 rows edge-less + backlogged
    sel = np.arange(len(data) - 12, len(data), dtype=np.int64)
    idx.graph_np[sel] = -1
    idx.graph_np[np.isin(idx.graph_np, sel)] = -1
    idx._unlinked_ids = sel
    idx._graph_dev = None
    idx._entry_dev = None
    # a resident commit (corpus well under the HBM budget) relinks them
    coll.add([len(data)], vectors=data[:1] + 0.01)
    coll.commit()
    assert len(idx._unlinked_ids) == 0
    assert (idx.graph_np[sel] >= 0).any(axis=1).all(), \
        "legacy backlog rows still edge-less after resident commit"
    # and they are genuinely searchable through the graph (not the merge)
    q = data[len(data) - 3]
    res = coll.search(q, k=5, nprobe=80)
    assert int(len(data) - 3) in {int(i) for i in res.ids}


def test_diskann_search_subbatches_past_beam_cap(db, graph_data, monkeypatch):
    """When the query batch exceeds _beam_batch_cap (the (b, n) visited
    bitmap budget — binding exactly at streaming scale), search must split
    the dispatch into capped sub-batches with identical results. Shrinking
    HBM_BYTES both forces streaming (PQ-guided path) and drops the cap to
    its 16-query floor, so a 40-query batch takes the chunked path."""
    import lynsedb_tpu.ops.scan as scan_mod
    from lynsedb_tpu.index.diskann import _beam_batch_cap

    data, _ = graph_data
    coll = db.require_collection("g_subbatch", dim=32,
                                 drop_if_exists=True, default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index("DISKANN-IP")
    monkeypatch.setattr(scan_mod, "HBM_BYTES", 64 * 1024)
    coll._engine._corpus = None
    assert coll._engine.corpus().would_stream()
    assert _beam_batch_cap(len(data)) == 16
    qs = data[:40] + np.float32(0.01)
    rows = coll.batch_search(qs, 10, nprobe=80)
    assert len(rows) == 40
    hits = 0
    for i, row in enumerate(rows):
        want = set(np.argsort(-(data @ qs[i]))[:10].tolist())
        hits += len({int(x) for x in row.ids} & want)
        # per-query single search must agree with the batched dispatch
        if i < 4:
            solo = coll.search(qs[i], k=10, nprobe=80)
            assert {int(x) for x in solo.ids} == {int(x) for x in row.ids}
    assert hits / 400 >= 0.9, hits / 400
