"""HTTP service tests: in-process background server driven through the
remote VectorDBClient (mirrors the reference's docker_tests pattern of
spawning a real server and driving it via HTTPClient)."""

import numpy as np
import pytest

import lynsedb_tpu as lynse
from lynsedb_tpu.server.app import BackgroundServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("server_root")
    srv = BackgroundServer(str(root), port=0)
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def rclient(server):
    c = lynse.VectorDBClient(server.url)
    yield c
    c.close()


@pytest.fixture
def rdb(rclient):
    return rclient.create_database("http_db", drop_if_exists=True)




def test_remote_roundtrip(rdb, rng):
    coll = rdb.require_collection("c1", dim=8, drop_if_exists=True)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    ids = coll.add(list(range(1, 21)), vectors=vecs,
                   fields=[{"idx": i, "group": "even" if i % 2 == 0 else "odd"}
                           for i in range(1, 21)])
    assert ids == list(range(1, 21))
    coll.commit()
    assert coll.shape == (20, 8)

    res = coll.search(vecs[0], k=3, return_fields=True)
    assert len(res.ids) == 3
    assert res.distance_metric == "IP"
    res = coll.search(vecs[0], k=20, where="group = 'even'")
    assert all(i % 2 == 0 for i in res.ids.tolist())


def test_remote_query_and_head(rdb, rng):
    coll = rdb.require_collection("c2", dim=4, drop_if_exists=True)
    coll.add([1, 2, 3], vectors=rng.normal(size=(3, 4)).astype(np.float32),
             fields=[{"x": i} for i in (1, 2, 3)])
    coll.commit()
    q = coll.query(where="x >= 2")
    assert sorted(q.ids.tolist()) == [2, 3]
    h = coll.head(2)
    assert h.ids.tolist() == [1, 2]
    assert h.vectors.shape == (2, 4)
    qv = coll.query_vectors(where="x = 1")
    assert qv.vectors.shape == (1, 4)


def test_remote_delete_upsert(rdb, rng):
    coll = rdb.require_collection("c3", dim=4, drop_if_exists=True)
    vecs = rng.normal(size=(5, 4)).astype(np.float32)
    coll.add([1, 2, 3, 4, 5], vectors=vecs)
    assert coll.delete([2]) == 1
    assert coll.list_deleted_ids() == [2]
    assert coll.restore([2]) == 1
    coll.upsert([3], vectors=[np.ones(4, dtype=np.float32)], fields=[{"u": True}])
    coll.commit()
    res = coll.search(np.ones(4, dtype=np.float32), k=1, return_fields=True)
    assert res.ids[0] == 3
    assert res.fields[0]["u"] is True


def test_remote_bm25_sparse_hybrid(rdb, rng):
    coll = rdb.require_collection("c4", dim=4, drop_if_exists=True)
    coll.add([1, 2], vectors=rng.normal(size=(2, 4)).astype(np.float32),
             fields=[{"t": "alpha beta"}, {"t": "gamma delta"}])
    coll.add_sparse_vectors([{1: 1.0}, {2: 2.0}], [1, 2])
    coll.commit()
    res = coll.bm25_search("gamma", k=5)
    assert res.ids.tolist() == [2]
    res = coll.search_sparse({2: 1.0}, k=5)
    assert res.ids.tolist() == [2]
    res = coll.hybrid_search(text="alpha", k=5)
    assert res.ids.tolist()[0] == 1


def test_remote_index_and_stats(rdb, rng):
    coll = rdb.require_collection("c5", dim=16, drop_if_exists=True, default_index=None)
    data = rng.normal(size=(500, 16)).astype(np.float32)
    coll.add(list(range(500)), vectors=data)
    coll.commit()
    coll.build_index("IVF-L2", n_clusters=8)
    assert coll.index_mode == "IVF-L2"
    res = coll.search(data[7], k=1, nprobe=8)
    assert res.ids[0] == 7
    st = coll.stats()
    assert st["rows"] == 500
    coll.remove_index()
    assert coll.index_mode.startswith("FLAT")


def test_remote_blobs(rdb):
    coll = rdb.require_collection("c6", dim=2, drop_if_exists=True)
    coll.write_blob("k1", b"payload-bytes")
    assert coll.read_blob("k1") == b"payload-bytes"
    assert coll.read_blob_range("k1", 0, 7) == b"payload"
    assert coll.delete_blob("k1") is True
    assert coll.read_blob("missing") is None


def test_remote_limits(server, rdb, rng):
    coll = rdb.require_collection("c7", dim=4, drop_if_exists=True)
    coll.add([1], vectors=[[1.0, 0, 0, 0]])
    with pytest.raises(Exception):
        coll.search([1.0, 0, 0, 0], k=999_999)


def test_ops_endpoints(server):
    import requests

    assert requests.get(server.url + "/healthz").status_code == 200
    assert requests.get(server.url + "/readyz").status_code == 200
    metrics = requests.get(server.url + "/metrics").text
    assert "lynse_http_requests_total" in metrics
    assert "lynse_uptime_seconds" in metrics
    assert "lynse_search_microbatches_total" in metrics
    assert "lynse_search_microbatched_queries_total" in metrics
    spec = requests.get(server.url + "/openapi.json").json()
    assert "/search" in spec["paths"]
    # x-request-id propagation
    r = requests.get(server.url + "/healthz", headers={"x-request-id": "req-42"})
    assert r.headers["x-request-id"] == "req-42"


def test_auth_required(tmp_path):
    srv = BackgroundServer(str(tmp_path / "auth_root"), port=0, api_key="sekret")
    try:
        import requests

        r = requests.get(srv.url + "/list_databases")
        assert r.status_code == 401
        r = requests.get(srv.url + "/list_databases",
                         headers={"Authorization": "Bearer sekret"})
        assert r.status_code == 200
        # client with key works end-to-end
        c = lynse.VectorDBClient(srv.url, api_key="sekret")
        db = c.create_database("authdb")
        coll = db.require_collection("c", dim=2)
        coll.add([1], vectors=[[0.5, 0.5]])
        res = coll.search([0.5, 0.5], k=1)
        assert res.ids[0] == 1
        c.close()
        # wrong key rejected
        with pytest.raises(ConnectionError):
            lynse.VectorDBClient(srv.url, api_key="wrong")
    finally:
        srv.stop()


def test_cluster_metadata_kv(server):
    import requests

    r = requests.post(server.url + "/cluster_metadata/get", json={"key": "t"}).json()
    assert r["params"]["version"] == 0
    r = requests.post(
        server.url + "/cluster_metadata/cas",
        json={"key": "t", "expected_version": 0, "value": {"a": 1}},
    ).json()
    assert r["params"]["ok"] is True
    r = requests.post(
        server.url + "/cluster_metadata/cas",
        json={"key": "t", "expected_version": 0, "value": {"a": 2}},
    ).json()
    assert r["params"]["ok"] is False
    r = requests.post(server.url + "/cluster_metadata/get", json={"key": "t"}).json()
    assert r["params"]["value"] == {"a": 1}


def test_remote_snapshot_export(rdb, rng, tmp_path):
    coll = rdb.require_collection("c8", dim=4, drop_if_exists=True)
    coll.add([1, 2], vectors=rng.normal(size=(2, 4)).astype(np.float32))
    coll.commit()
    snap = tmp_path / "snap_remote"
    coll.snapshot_to(snap)
    restored = rdb.restore_collection(snap, "c8_restored")
    assert restored.shape == (2, 4)
    exp = tmp_path / "exp_remote"
    coll.export_to(exp)
    imported = rdb.import_collection(exp, "c8_imported")
    assert imported.shape == (2, 4)


def test_f16_wire_roundtrip(rdb, rng):
    """wire_dtype=float16 is honored end-to-end: f16 vector payloads on add,
    upsert and search (half the wire bytes), exact f32 engine state
    (reference: f16 wire family, flat_mmap.rs:807-1074 / server/mod.rs:4649)."""
    coll = rdb.require_collection("cf16", dim=16, drop_if_exists=True)
    vecs = rng.normal(size=(64, 16)).astype(np.float32)
    coll.add(list(range(64)), vectors=vecs, wire_dtype="float16")
    coll.commit()
    # f16 query upload: results must match an f32-wire query of the same vector
    r16 = coll.search(vecs[5], k=5, wire_dtype="float16")
    r32 = coll.search(vecs[5].astype(np.float16).astype(np.float32), k=5)
    assert r16.ids.tolist() == r32.ids.tolist()
    np.testing.assert_allclose(r16.distances, r32.distances, rtol=1e-6)
    # stored rows are the f16-rounded values (the wire was honest, not ignored)
    got = coll.query_vectors(where=None)
    stored = {int(i): v for i, v in zip(got.ids.tolist(), np.asarray(got.vectors))}
    np.testing.assert_allclose(stored[5], vecs[5].astype(np.float16).astype(np.float32), rtol=1e-6)
    # f16 upsert
    coll.upsert([5], vectors=(vecs[5] * 2).reshape(1, -1), wire_dtype="float16")
    got2 = coll.query_vectors(where=None)
    stored2 = {int(i): v for i, v in zip(got2.ids.tolist(), np.asarray(got2.vectors))}
    np.testing.assert_allclose(
        stored2[5], (vecs[5] * 2).astype(np.float16).astype(np.float32), rtol=1e-6
    )
    with pytest.raises(ValueError):
        coll.search(vecs[0], k=3, wire_dtype="bfloat16")


def test_batch_search_binary_fast_path(rdb, rng):
    coll = rdb.require_collection("cbb", dim=8, drop_if_exists=True)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    coll.add(list(range(40)), vectors=vecs)
    coll.commit()
    out = coll.batch_search(vecs[:4], k=3)
    want = np.argsort(-(vecs[:4] @ vecs.T), axis=1)[:, :3]
    for b in range(4):
        assert out[b].ids.tolist() == want[b].tolist()


def test_concurrent_search_microbatch(server, rdb, rng):
    """Concurrent single-query /search requests coalesce into fused
    batch_search dispatches (server-side micro-batching) and return the
    same results as sequential searches."""
    from concurrent.futures import ThreadPoolExecutor

    coll = rdb.require_collection("cmb", dim=16, drop_if_exists=True)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    coll.add(list(range(200)), vectors=vecs)
    coll.commit()

    want = np.argsort(-(vecs[:32] @ vecs.T), axis=1)[:, :5]
    stats = server.server.microbatch_stats
    before = dict(stats)
    with ThreadPoolExecutor(max_workers=16) as pool:
        results = list(pool.map(lambda i: coll.search(vecs[i], k=5), range(32)))
    for i, res in enumerate(results):
        assert res.ids.tolist() == want[i].tolist()
    q = stats["queries"] - before["queries"]
    b = stats["batches"] - before["batches"]
    assert q == 32
    assert b < q  # at least some requests actually coalesced


def test_concurrent_search_microbatch_mixed_params(rdb, rng):
    """Different (k, where) groups never cross-contaminate under the
    micro-batcher: filtered and unfiltered concurrent searches each see
    their own result set."""
    from concurrent.futures import ThreadPoolExecutor

    coll = rdb.require_collection("cmb2", dim=8, drop_if_exists=True)
    vecs = rng.normal(size=(100, 8)).astype(np.float32)
    coll.add(list(range(100)), vectors=vecs,
             fields=[{"par": i % 2} for i in range(100)])
    coll.commit()

    def one(i):
        if i % 2:
            return i, coll.search(vecs[i], k=4, where="par = 1")
        return i, coll.search(vecs[i], k=4)

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(one, range(16)))
    scores = vecs[:16] @ vecs.T
    for i, res in results:
        if i % 2:
            mask = np.asarray([j % 2 == 1 for j in range(100)])
            want = np.argsort(-np.where(mask, scores[i], -np.inf))[:4]
            assert all(int(x) % 2 == 1 for x in res.ids.tolist())
        else:
            want = np.argsort(-scores[i])[:4]
        assert res.ids.tolist() == want.tolist()


def test_concurrent_hybrid_microbatch(server, rdb, rng, tmp_path):
    """Concurrent /hybrid_search requests ride the same micro-batcher as
    /search for their vector plane (one fused dispatch) and return exactly
    the engine's own hybrid_search fusion (verified against an embedded
    mirror of the same data)."""
    from concurrent.futures import ThreadPoolExecutor

    coll = rdb.require_collection("hmb", dim=16, drop_if_exists=True)
    vecs = rng.normal(size=(120, 16)).astype(np.float32)
    words = ["alpha", "beta", "gamma", "delta"]
    fields = [{"doc": f"{words[i % 4]} note {i}"} for i in range(120)]
    coll.add(list(range(120)), vectors=vecs, fields=fields)
    coll.commit()

    local = lynse.VectorDBClient(str(tmp_path / "hybrid_mirror"))
    ldb = local.create_database("m")
    lcoll = ldb.require_collection("hmb", dim=16)
    lcoll.add(list(range(120)), vectors=vecs, fields=fields)
    lcoll.commit()

    stats = server.server.microbatch_stats
    before = dict(stats)
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(
            lambda i: coll.hybrid_search(vector=vecs[i], text=words[i % 4], k=5),
            range(24)))
    for i, res in enumerate(results):
        want = lcoll.hybrid_search(vecs[i], words[i % 4], k=5)
        assert res.ids.tolist() == want.ids.tolist(), i
        np.testing.assert_allclose(res.distances, want.distances, rtol=1e-5)
    # every hybrid request's vector plane went through the batcher
    assert stats["queries"] - before["queries"] == 24
    local.close()


def test_concurrent_mixed_ops_stress(rdb, rng):
    """Server stress: concurrent hybrid searches, plain searches, adds and
    commits on one collection never error and never return stale shapes —
    the micro-batcher must stay consistent across write epochs."""
    from concurrent.futures import ThreadPoolExecutor

    coll = rdb.require_collection("stress", dim=12, drop_if_exists=True)
    vecs = rng.normal(size=(400, 12)).astype(np.float32)
    coll.add(list(range(200)), vectors=vecs[:200],
             fields=[{"doc": f"w{i % 5} row"} for i in range(200)])
    coll.commit()

    def op(i):
        kind = i % 4
        if kind == 0:
            res = coll.search(vecs[i % 200], k=5)
            assert len(res.ids) == 5
        elif kind == 1:
            res = coll.hybrid_search(vector=vecs[i % 200], text=f"w{i % 5}", k=5)
            assert len(res.ids) == 5
        elif kind == 2:
            base = 200 + (i % 50) * 4
            coll.add(list(range(base, base + 4)), vectors=vecs[base % 400: base % 400 + 4])
        else:
            coll.commit()
        return True

    with ThreadPoolExecutor(max_workers=10) as pool:
        assert all(pool.map(op, range(80)))
    coll.commit()
    res = coll.search(vecs[0], k=10)
    assert len(res.ids) == 10


def test_hybrid_search_with_microbatching_disabled(tmp_path, rng):
    """With micro-batching off (gather_ms < 0) /hybrid_search falls back to
    the engine's own overlapped path and returns identical results."""
    srv = BackgroundServer(str(tmp_path / "nomb"), port=0, microbatch_gather_ms=-1)
    try:
        c = lynse.VectorDBClient(srv.url)
        db = c.create_database("d", drop_if_exists=True)
        coll = db.require_collection("c", dim=8)
        vecs = rng.normal(size=(30, 8)).astype(np.float32)
        words = ["alpha", "beta"]
        coll.add(list(range(30)), vectors=vecs,
                 fields=[{"doc": f"{words[i % 2]} row {i}"} for i in range(30)])
        coll.commit()

        local = lynse.VectorDBClient(str(tmp_path / "nomb_mirror"))
        lcoll = local.create_database("d").require_collection("c", dim=8)
        lcoll.add(list(range(30)), vectors=vecs,
                  fields=[{"doc": f"{words[i % 2]} row {i}"} for i in range(30)])
        lcoll.commit()

        for i in (0, 1, 7):
            got = coll.hybrid_search(vector=vecs[i], text=words[i % 2], k=5)
            want = lcoll.hybrid_search(vecs[i], words[i % 2], k=5)
            assert got.ids.tolist() == want.ids.tolist(), i
        assert srv.server.microbatch_stats["queries"] == 0  # batcher unused
        local.close()
        c.close()
    finally:
        srv.stop()


def test_prewarm_route(rdb, rng):
    coll = rdb.require_collection("cpw", dim=8, drop_if_exists=True)
    coll.add(list(range(50)), vectors=rng.normal(size=(50, 8)).astype(np.float32))
    coll.commit()
    secs = coll.prewarm()
    assert secs >= 0.0
    res = coll.search(np.zeros(8, np.float32), k=3)
    assert len(res.ids) == 3


def test_remote_named_field_batch_search_maps_sub_ids(rdb, rng):
    """batch_search over a named vector field must map result ids/fields
    through the SUB-collection (parent has 3 rows, sub has 5 — a parent-map
    translation would return wrong ids or fail)."""
    coll = rdb.require_collection("cnf", dim=8, drop_if_exists=True)
    coll.add([1, 2, 3], vectors=rng.normal(size=(3, 8)).astype(np.float32))
    coll.commit()
    coll.create_vector_field("img", dim=4, metric="ip")
    img = rng.normal(size=(5, 4)).astype(np.float32)
    sub_ids = [10, 20, 30, 40, 50]
    coll.add_named_vectors("img", sub_ids, img)
    coll.commit()
    batch = coll.batch_search(img[:2], k=3, vector_field="img")
    for row in batch:
        assert set(row.ids.tolist()) <= set(sub_ids), row.ids
    single = coll.search(img[0], k=3, vector_field="img")
    assert batch[0].ids.tolist() == single.ids.tolist()


def test_remote_restore_bad_path_preserves_database(rclient, rng):
    """restore_database(overwrite=True) with a bad snapshot path must fail
    WITHOUT dropping the existing database (validate-then-drop, server-side)."""
    db = rclient.create_database("resdb", drop_if_exists=True)
    coll = db.require_collection("c", dim=4, drop_if_exists=True)
    coll.add([1, 2], vectors=rng.normal(size=(2, 4)).astype(np.float32))
    coll.commit()
    with pytest.raises(Exception, match="snapshot"):
        db.restore_database("/nonexistent/snapshot/path", overwrite=True)
    assert db.database_exists()
    assert rclient.get_database("resdb").get_collection("c").shape[0] == 2


def test_remote_set_environment_atomic_on_bad_value(rdb):
    """A payload with one invalid typed value must be rejected WITHOUT
    applying any key (partial application corrupts typed config knobs)."""
    rdb.set_environment({"LYNSE_KMEANS_EPOCHS": "7"})
    before = rdb.get_environment()
    with pytest.raises(Exception, match="integer"):
        rdb.set_environment({
            "LYNSE_LOG_LEVEL": "CRITICAL",
            "LYNSE_KMEANS_EPOCHS": "not-an-int",
        })
    after = rdb.get_environment()
    assert after["LYNSE_KMEANS_EPOCHS"] == "7"
    assert after["LYNSE_LOG_LEVEL"] == before["LYNSE_LOG_LEVEL"]
    # valid payloads still apply
    rdb.set_environment({"LYNSE_KMEANS_EPOCHS": "8"})
    assert rdb.get_environment()["LYNSE_KMEANS_EPOCHS"] == "8"


def test_remote_batch_search_returns_fields(rdb, rng):
    """return_fields=True must produce field dicts over the remote transport
    (the binary route carries no fields — the client must route to JSON)."""
    coll = rdb.require_collection("cbf", dim=4, drop_if_exists=True)
    coll.add([1, 2, 3], vectors=rng.normal(size=(3, 4)).astype(np.float32),
             fields=[{"tag": f"t{i}"} for i in (1, 2, 3)])
    coll.commit()
    rows = coll.batch_search(rng.normal(size=(2, 4)).astype(np.float32),
                             k=2, return_fields=True)
    for row in rows:
        assert len(row.fields) == 2
        assert all("tag" in f for f in row.fields)


def test_remote_search_rejects_malformed_vectors(rdb, rng):
    """A 0-d or multi-row 'vector' must 400 at the handler — a mis-shaped
    vector reaching the micro-batcher would poison np.stack for every
    request coalesced into the same window (hung futures)."""
    coll = rdb.require_collection("cmal", dim=8, drop_if_exists=True)
    vecs = rng.normal(size=(10, 8)).astype(np.float32)
    coll.add(list(range(10)), vectors=vecs)
    coll.commit()
    import requests as rq
    base = coll._client._session.base_url
    body = {"database_name": "http_db", "collection_name": "cmal", "k": 3}
    r = rq.post(base + "/search", json={**body, "vector": 5.0})
    assert r.status_code == 400, r.text
    r = rq.post(base + "/search", json={**body, "vector": vecs[:2].tolist()})
    assert r.status_code == 400, r.text
    # well-formed traffic still works after the rejects
    res = coll.search(vecs[0], k=3)
    assert len(res.ids) == 3


def test_microbatcher_kwarg_only_exception_fans_out():
    """A batch-level engine error whose exception class has a kwarg-only
    constructor must still fan out to every waiting future: copy.copy on
    such an instance raises TypeError (BaseException.__reduce__ rebuilds
    via cls(*args)), which previously escaped the fan-out loop, killed the
    drain task, and hung every unresolved request in the batch."""
    import asyncio

    from lynsedb_tpu.server.app import _MicroBatcher

    class KwErr(Exception):
        def __init__(self, *, code):
            super().__init__(code)
            self.code = code

    class FakeServer:
        microbatch_gather_ms = 0
        microbatch_stats = {"batches": 0, "queries": 0}

        async def _run(self, *a, **k):
            raise KwErr(code=7)

    class FakeColl:
        batch_search = staticmethod(lambda *a, **k: None)

    async def main():
        b = _MicroBatcher(FakeServer(), coll=FakeColl(), params={})
        return await asyncio.gather(
            *(b.submit(np.zeros(4, np.float32)) for _ in range(5)),
            return_exceptions=True)

    outs = asyncio.run(main())
    assert len(outs) == 5
    assert all(isinstance(o, KwErr) and o.code == 7 for o in outs), outs


def test_raw_transport_recovers_dropped_keepalive(server):
    """The binary search wire rides a thread-local keep-alive http.client
    connection (api/http_client.py post_raw). A server-side close between
    requests must be retried transparently — exactly once — while a read
    timeout must surface (the request may still be executing server-side)."""
    c = lynse.VectorDBClient(server.url)
    db = c.create_database("rawt", drop_if_exists=True)
    coll = db.require_collection("v", dim=8, default_index=None)
    vecs = np.eye(8, dtype=np.float32)
    coll.add(list(range(8)), vectors=vecs)
    coll.commit()
    q = vecs[3]
    ids1 = set(map(int, coll.search(q, k=2).ids.tolist()))
    assert 3 in ids1
    # drop the keep-alive behind the session's back: next call retries fresh
    sess = c._session
    conn = getattr(sess._local, "conn", None)
    assert conn is not None, "binary search should have used the raw transport"
    conn.close()
    ids2 = set(map(int, coll.search(q, k=2).ids.tolist()))
    assert ids2 == ids1
    c.close()


def test_client_timeout_plumbs_to_session(server):
    c = lynse.VectorDBClient(server.url, timeout=7.5)
    assert c._session.timeout == 7.5
    c.close()
