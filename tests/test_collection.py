"""End-to-end embedded-mode tests: client -> collection -> engine -> device."""

import numpy as np
import pytest

import lynsedb_tpu as lynse


def test_create_database_and_collection(client):
    db = client.create_database("db1", drop_if_exists=True)
    coll = db.require_collection("c1", dim=4)
    assert client.database_exists("db1")
    assert "c1" in db.show_collections()
    assert coll.shape == (0, 4)


def test_add_and_search_roundtrip(populated_collection):
    coll, vectors, ids = populated_collection
    res = coll.search(vectors[0], k=3)
    assert res.ids[0] == ids[0]
    assert len(res.ids) == 3
    assert res.distance_metric == "IP"
    assert res.index_type == "Flat"


def test_auto_ids(db):
    coll = db.require_collection("auto", dim=4, drop_if_exists=True)
    first = coll.add(vectors=np.eye(4, dtype=np.float32))
    assert first == [0, 1, 2, 3]
    nxt = coll.add(vectors=np.ones((1, 4), dtype=np.float32))
    assert nxt == 4
    coll.commit()
    assert coll.shape == (5, 4)


def test_string_ids(db, rng):
    coll = db.require_collection("strs", dim=8, drop_if_exists=True)
    vecs = rng.normal(size=(3, 8)).astype(np.float32)
    coll.add(["doc-a", "doc-b", "doc-c"], vectors=vecs)
    coll.commit()
    res = coll.search(vecs[1], k=1)
    assert res.ids[0] == "doc-b"
    assert coll.is_id_exists("doc-a")
    assert not coll.is_id_exists("doc-z")


def test_duplicate_id_rejected(db):
    coll = db.require_collection("dups", dim=2, drop_if_exists=True)
    coll.add([1], vectors=[[1.0, 0.0]])
    with pytest.raises(Exception):
        coll.add([1], vectors=[[0.0, 1.0]])
    with pytest.raises(Exception):
        coll.add([7, 7], vectors=[[0.0, 1.0], [1.0, 0.0]])


def test_fields_and_filtered_search(populated_collection):
    coll, vectors, ids = populated_collection
    res = coll.search(vectors[0], k=20, where="group = 'even'", return_fields=True)
    assert len(res.ids) == 10
    assert all(f["group"] == "even" for f in res.fields)
    assert all(i % 2 == 0 for i in res.ids)


def test_filter_numeric_range(populated_collection):
    coll, vectors, ids = populated_collection
    res = coll.search(vectors[0], k=20, where="idx >= 5 AND idx < 9")
    assert sorted(res.ids.tolist()) == [5, 6, 7, 8]


def test_filter_in_and_or(populated_collection):
    coll, vectors, _ = populated_collection
    res = coll.search(vectors[0], k=20, where="idx IN (1, 3, 5)")
    assert sorted(res.ids.tolist()) == [1, 3, 5]
    res = coll.search(vectors[0], k=20, where="idx = 1 OR idx = 2")
    assert sorted(res.ids.tolist()) == [1, 2]


def test_query_and_query_vectors(populated_collection):
    coll, vectors, ids = populated_collection
    q = coll.query(where="group = 'odd'")
    assert len(q.ids) == 10
    qv = coll.query_vectors(where="idx = 3")
    assert qv.vectors.shape == (1, 8)
    np.testing.assert_allclose(qv.vectors[0], vectors[2], rtol=1e-6)
    only = coll.query(where="idx = 3", return_ids_only=True)
    assert only.tolist() == [3]


def test_delete_restore(populated_collection):
    coll, vectors, ids = populated_collection
    assert coll.delete([1, 2]) == 2
    res = coll.search(vectors[0], k=20)
    assert 1 not in res.ids and 2 not in res.ids
    assert sorted(coll.list_deleted_ids()) == [1, 2]
    assert coll.restore([1]) == 1
    res = coll.search(vectors[0], k=20)
    assert 1 in res.ids
    assert coll.list_deleted_ids() == [2]


def test_upsert(populated_collection):
    coll, vectors, ids = populated_collection
    new_vec = np.full(8, 9.0, dtype=np.float32)
    coll.upsert([5], vectors=[new_vec], fields=[{"group": "changed"}])
    coll.commit()
    res = coll.search(new_vec, k=1, return_fields=True)
    assert res.ids[0] == 5
    assert res.fields[0]["group"] == "changed"
    # upsert of a new id inserts
    coll.upsert([999], vectors=[np.ones(8, dtype=np.float32)])
    assert coll.is_id_exists(999)


def test_update_fields_only(populated_collection):
    coll, vectors, _ = populated_collection
    coll.update_fields([3], [{"extra": "yes"}])
    res = coll.query(where="extra = 'yes'")
    assert res.ids.tolist() == [3]
    # original fields are preserved (merge semantics)
    assert res.fields[0]["group"] == "odd"


def test_head_tail(populated_collection):
    coll, _, ids = populated_collection
    h = coll.head(3)
    assert h.ids.tolist() == [1, 2, 3]
    assert h.vectors.shape == (3, 8)
    t = coll.tail(2)
    assert t.ids.tolist() == [19, 20]


def test_persistence_roundtrip(tmp_root, rng):
    vecs = rng.normal(size=(10, 4)).astype(np.float32)
    client = lynse.VectorDBClient(tmp_root)
    db = client.create_database("p", drop_if_exists=True)
    coll = db.require_collection("c", dim=4)
    coll.add(list(range(10)), vectors=vecs, fields=[{"i": i} for i in range(10)])
    coll.commit()
    client.close()

    client2 = lynse.VectorDBClient(tmp_root)
    coll2 = client2.get_database("p").get_collection("c", warm_up=False)
    assert coll2.shape == (10, 4)
    res = coll2.search(vecs[7], k=1, return_fields=True)
    assert res.ids[0] == 7
    assert res.fields[0]["i"] == 7
    client2.close()


def test_wal_recovery_without_commit(tmp_root, rng):
    """Rows added but never committed must survive via WAL replay."""
    vecs = rng.normal(size=(5, 4)).astype(np.float32)
    client = lynse.VectorDBClient(tmp_root)
    db = client.create_database("w", drop_if_exists=True)
    coll = db.require_collection("c", dim=4)
    coll.add(list(range(5)), vectors=vecs, fields=[{"i": i} for i in range(5)])
    # simulate crash: no commit, no close — reopen from disk
    del coll, db

    # release the manager lock first
    client.close()
    client2 = lynse.VectorDBClient(tmp_root)
    coll2 = client2.get_database("w").get_collection("c", warm_up=False)
    assert coll2.shape == (5, 4)
    res = coll2.search(vecs[2], k=1, return_fields=True)
    want = int(np.argmax(vecs @ vecs[2]))  # IP ground truth
    assert res.ids[0] == want
    assert res.fields[0]["i"] == want
    client2.close()


def test_stats_and_compact(populated_collection):
    coll, vectors, _ = populated_collection
    coll.delete([1, 2, 3])
    st = coll.stats()
    assert st["rows"] == 20 and st["deleted_rows"] == 3
    reclaimed = coll.compact()
    assert reclaimed == 3
    assert coll.shape == (17, 8)
    # external ids and vectors survive compaction intact
    qv = coll.query_vectors(where="idx = 5")
    assert qv.ids.tolist() == [5]
    np.testing.assert_allclose(qv.vectors[0], vectors[4], rtol=1e-6)
    st = coll.stats()
    assert st["deleted_rows"] == 0


def test_drop_collection(db):
    coll = db.require_collection("todrop", dim=2, drop_if_exists=True)
    coll.add([1], vectors=[[1.0, 0.0]])
    coll.commit()
    db.drop_collection("todrop")
    assert "todrop" not in db.show_collections()


def test_snapshot_restore(populated_collection, db, tmp_path):
    coll, vectors, _ = populated_collection
    snap = tmp_path / "snap"
    coll.snapshot_to(snap)
    restored = db.restore_collection(snap, "restored")
    assert restored.shape == (20, 8)
    res = restored.search(vectors[0], k=1)
    assert res.ids[0] == 1


def test_export_import(populated_collection, db, tmp_path):
    coll, vectors, _ = populated_collection
    exp = tmp_path / "exp"
    coll.export_to(exp)
    imported = db.import_collection(exp, "imported")
    assert imported.shape == (20, 8)
    res = imported.search(vectors[3], k=1, return_fields=True)
    assert res.ids[0] == 4


def test_blobs(populated_collection):
    coll, _, _ = populated_collection
    coll.write_blob("model.bin", b"hello world")
    assert coll.read_blob("model.bin") == b"hello world"
    assert coll.read_blob_range("model.bin", 6, 5) == b"world"
    assert coll.delete_blob("model.bin")
    assert coll.read_blob("model.bin") is None


def test_insert_session(db, rng):
    coll = db.require_collection("sess", dim=4, drop_if_exists=True)
    vecs = rng.normal(size=(7, 4)).astype(np.float32)
    with coll.insert_session() as s:
        s.add(vectors=vecs)
    assert coll.shape == (7, 4)


def test_insert_session_rollback(db, rng):
    coll = db.require_collection("sess2", dim=4, drop_if_exists=True)
    try:
        with coll.insert_session() as s:
            s.add(vectors=rng.normal(size=(3, 4)).astype(np.float32))
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert coll.shape == (0, 4)


def test_search_range(populated_collection):
    coll, vectors, _ = populated_collection
    # IP is descending: range search keeps scores >= threshold
    res = coll.search_range(vectors[0], threshold=-100.0)
    assert len(res.ids) == 20
    res = coll.search_range(vectors[0], threshold=float(res.distances[2]))
    assert len(res.ids) == 3


def test_reranker_hook(populated_collection):
    coll, vectors, ids = populated_collection

    def reranker(payload):
        # reverse the order
        return [item["id"] for item in reversed(payload["items"])]

    plain = coll.search(vectors[0], k=5)
    reranked = coll.search(vectors[0], k=5, reranker=reranker)
    assert reranked.ids.tolist() == plain.ids.tolist()[::-1]
    top2 = coll.search(vectors[0], k=5, reranker=reranker, rerank_k=2)
    assert len(top2.ids) == 2


def test_document_add_and_search(db):
    coll = db.require_collection("docs", drop_if_exists=True, default_index="FLAT-COS")
    coll.add(
        ["a", "b", "c"],
        documents=["the quick brown fox", "lazy dogs sleep", "quick brown foxes jump"],
    )
    coll.commit()
    res = coll.search(document="quick brown fox", k=2, return_fields=True)
    assert set(res.ids.tolist()) <= {"a", "b", "c"}
    assert res.ids[0] == "a"
    assert "document" in res.fields[0]


def test_read_only_mode(tmp_root, rng):
    client = lynse.VectorDBClient(tmp_root)
    db = client.create_database("ro", drop_if_exists=True)
    coll = db.require_collection("c", dim=4)
    coll.add([1], vectors=[[1.0, 0, 0, 0]])
    coll.commit()
    client.close()

    ro = lynse.VectorDBClient(tmp_root, read_only=True)
    coll2 = ro.get_database("ro").get_collection("c", warm_up=False)
    with pytest.raises(Exception):
        coll2.add([2], vectors=[[0, 1.0, 0, 0]])
    res = coll2.search([1.0, 0, 0, 0], k=1)
    assert res.ids[0] == 1
    ro.close()


def test_batch_search(populated_collection):
    coll, vectors, ids = populated_collection
    results = coll.batch_search(vectors[:4], k=3)
    assert len(results) == 4
    for i, rv in enumerate(results):
        assert rv.ids[0] == ids[i]


def test_named_vector_fields(db, rng):
    coll = db.require_collection("multi", dim=4, drop_if_exists=True)
    coll.add([1, 2], vectors=rng.normal(size=(2, 4)).astype(np.float32))
    coll.create_vector_field("image", dim=8, metric="l2")
    img = rng.normal(size=(2, 8)).astype(np.float32)
    coll.add_named_vectors("image", [1, 2], img)
    coll.commit()
    assert coll.list_vector_fields() == ["image"]
    res = coll.search(img[1], k=1, vector_field="image")
    assert res.ids[0] == 2
    assert res.distance_metric == "L2"


def test_search_cache_hit_and_write_invalidation(db, rng):
    """Repeated identical queries hit the result cache; any write
    invalidates it via the write-version key component (reference:
    SEARCH_CACHE_SIZE/EXPIRE config surface, config.py:138-225)."""
    coll = db.require_collection("cache_c", dim=8, drop_if_exists=True)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    coll.add(list(range(50)), vectors=vecs)
    coll.commit()
    eng = coll._engine
    eng._search_cache.clear()
    q = vecs[3]
    r1 = coll.search(q, k=5)
    misses0 = eng._search_cache.misses
    r2 = coll.search(q, k=5)
    assert eng._search_cache.hits >= 1
    assert eng._search_cache.misses == misses0
    assert r1.ids.tolist() == r2.ids.tolist()
    # a write must invalidate: new row is the best match afterwards
    coll.add([999], vectors=q.reshape(1, -1) * 3.0)
    coll.commit()
    r3 = coll.search(q, k=5)
    assert int(r3.ids[0]) == 999


def test_search_profile_rerank_us(populated_collection):
    coll, vectors, ids = populated_collection

    def reranker(payload):
        return list(reversed([item["id"] for item in payload["items"]]))

    prof = coll.search_profile(vectors[0], k=5, reranker=reranker)
    assert prof["rerank_us"] > 0
    assert prof["total_us"] >= prof["rerank_us"]
    prof2 = coll.search_profile(vectors[0], k=5)
    assert prof2["rerank_us"] == 0


def test_float16_storage_dtype_end_to_end(db, rng):
    """dtypes='float16' halves on-disk vector bytes (reference: dtype.rs f16
    store family) while searches stay correct (values round-trip f16)."""
    d = 32
    vecs = rng.normal(size=(500, d)).astype(np.float32)
    c16 = db.require_collection("f16c", dim=d, dtypes="float16", drop_if_exists=True)
    c32 = db.require_collection("f32c", dim=d, dtypes="float32", drop_if_exists=True)
    for coll in (c16, c32):
        coll.add(list(range(500)), vectors=vecs)
        coll.commit()
    assert c16._engine.store.disk_bytes() * 2 <= c32._engine.store.disk_bytes() + 4096
    q = vecs[9]
    r16 = c16.search(q, k=5)
    want = np.argsort(-(vecs.astype(np.float16).astype(np.float32) @ q))[:5]
    assert int(r16.ids[0]) == int(want[0])
    # reopen from disk: rows come back f16-rounded
    row = c16._engine.row_vector(9)
    np.testing.assert_allclose(row, vecs[9].astype(np.float16).astype(np.float32), rtol=1e-3)


def test_concurrent_searches_and_writes_are_safe(db, rng):
    """Parallel searches interleaved with writes must never crash or return
    rows that were deleted before the search began (reference safety model:
    ownership + locks; here the engine RLock + epoch-invalidated caches)."""
    import threading

    coll = db.require_collection("conc", dim=16, drop_if_exists=True)
    vecs = rng.normal(size=(2000, 16)).astype(np.float32)
    coll.add(list(range(2000)), vectors=vecs)
    coll.commit()

    errors: list = []
    stop = threading.Event()

    def searcher():
        i = 0
        while not stop.is_set():
            try:
                res = coll.search(vecs[i % 2000], k=5)
                assert len(res.ids) > 0
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return
            i += 1

    def writer():
        try:
            for w in range(10):
                base = 2000 + w * 50
                coll.add(list(range(base, base + 50)),
                         vectors=rng.normal(size=(50, 16)).astype(np.float32))
                coll.delete([w * 3])
                coll.commit()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    wt = threading.Thread(target=writer)
    for t in threads:
        t.start()
    wt.start()
    wt.join()
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not errors, errors
    # post-churn state is consistent
    res = coll.search(vecs[1], k=10)
    deleted = set(range(0, 30, 3))
    assert not (deleted & set(int(x) for x in res.ids))
    assert coll._engine.n_rows == 2500


def test_profile_scanned_vectors_honest(db, rng):
    """scanned_vectors reports rows whose distances were actually computed
    per path (reference engine.rs:6906), not the filter-subset size."""
    data = rng.normal(size=(6000, 16)).astype(np.float32)
    coll = db.require_collection("prof_scan", dim=16, drop_if_exists=True, default_index=None)
    coll.add(list(range(6000)), vectors=data, fields=[{"g": i % 3} for i in range(6000)])
    coll.commit()

    prof = coll.search_profile(data[0], k=5)
    assert prof["scanned_vectors"] >= 6000  # full first pass (+ shortlist)

    coll.build_index("IVF-L2", n_clusters=32)
    prof = coll.search_profile(data[0], k=5, nprobe=4)
    assert prof["index_path"] == "ivf"
    assert 0 < prof["scanned_vectors"] < 6000  # probed clusters only

    coll.build_index("HNSW-L2")
    prof = coll.search_profile(data[0], k=5, nprobe=48)
    assert prof["index_path"] == "hnsw"
    assert 0 < prof["scanned_vectors"] < 6000  # visited nodes only


def test_batch_search_submit_matches_sync(db, rng):
    """The async flat-path resolver returns exactly what batch_search
    returns (same ids, distances, metadata), honors where-filters, and
    yields None once an index makes the synchronous path authoritative."""
    coll = db.require_collection("bss", dim=16, drop_if_exists=True)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    coll.add(list(range(300)), vectors=vecs,
             fields=[{"bucket": i % 3} for i in range(300)])
    coll.commit()
    eng = coll._engine
    q = vecs[:7] + np.float32(0.01)

    resolver = eng.batch_search_submit(q, 5)
    assert resolver is not None
    got = resolver()
    want = eng.batch_search(q, 5)
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(want.ids))
    np.testing.assert_allclose(np.asarray(got.distances),
                               np.asarray(want.distances), rtol=1e-6)
    assert got.distance_metric == want.distance_metric
    assert got.index_type == want.index_type

    fil = eng.batch_search_submit(q, 5, where="bucket = 1")()
    fil_want = eng.batch_search(q, 5, where="bucket = 1")
    np.testing.assert_array_equal(np.asarray(fil.ids), np.asarray(fil_want.ids))
    assert (np.asarray(fil.ids) % 3 == 1).all()

    coll.build_index("IVF-IP", n_clusters=4)
    assert eng.batch_search_submit(q, 5) is None
