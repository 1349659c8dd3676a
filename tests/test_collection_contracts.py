"""Collection behavioral contracts mirrored from the reference standard
suite's depth rows (reference: tests/standard_tests/test_collection.py —
empty-collection edges, head/tail defaults, pre-commit visibility,
checkpoint semantics, compact invariants, upsert field preservation,
default-index policy, build-kwarg filtering).

Every assertion here is a hard contract independent of recall.
"""

import numpy as np
import pytest

import lynsedb_tpu as lynse
from lynsedb_tpu.engine.errors import InvalidArgument


@pytest.fixture
def coll(db):
    return db.require_collection("contracts", dim=8, drop_if_exists=True)


def _vecs(rng, n, dim=8):
    return rng.normal(size=(n, dim)).astype(np.float32)


# ── empty-collection edges ──────────────────────────────────────────────


def test_empty_collection_edges(coll):
    assert coll.shape == (0, 8)
    assert coll.max_id() == -1
    assert coll.is_id_exists(0) is False
    assert coll.list_deleted_ids() == []
    assert coll.list_fields() == []
    assert coll.compact() == 0
    st = coll.stats()
    assert st["rows"] == 0 and st["live_rows"] == 0 and st["dim"] == 8


def test_remove_index_on_no_index_is_noop(coll):
    # removing with no ANN index leaves the flat scan serving (the mode
    # reverts to the metric's flat family, same as the reference where
    # the engine always retains brute-force search)
    coll.remove_index()
    assert coll.index_mode in (None, "FLAT-IP")


def test_delete_nonexistent_ids_is_noop(coll, rng):
    coll.add([1, 2], vectors=_vecs(rng, 2))
    coll.commit()
    assert coll.delete([99, 100]) == 0
    assert coll.shape[0] == 2


# ── add contracts ───────────────────────────────────────────────────────


def test_single_add_returns_scalar_id(coll):
    rid = coll.add(vectors=np.ones(8, dtype=np.float32))
    assert rid == 0
    rid2 = coll.add(vectors=np.ones(8, dtype=np.float32) * 2)
    assert rid2 == 1


def test_add_1d_vector_is_one_row(coll):
    coll.add([7], vectors=np.arange(8, dtype=np.float32))
    coll.commit()
    assert coll.shape == (1, 8)
    got = coll.query_vectors(filter_ids=[7])
    np.testing.assert_allclose(np.asarray(got.vectors)[0], np.arange(8), rtol=1e-6)


def test_auto_ids_continue_after_max(coll, rng):
    coll.add([10, 20], vectors=_vecs(rng, 2))
    new = coll.add(vectors=_vecs(rng, 3))
    assert new == [21, 22, 23]


def test_add_is_readable_before_commit(coll, rng):
    x = _vecs(rng, 5)
    coll.add(list(range(5)), vectors=x)
    # pending rows must be visible to point reads AND searches pre-commit
    # (reference merges the pending-ingest buffer into results,
    # engine.rs pending_search)
    assert coll.is_id_exists(3)
    assert coll.shape[0] == 5
    res = coll.search(x[2], k=1)
    assert int(res.ids[0]) == 2


# ── default-index policy ────────────────────────────────────────────────


def test_default_index_builds_after_first_write(db, rng):
    c = db.require_collection("dflt", dim=8, drop_if_exists=True)
    assert c.index_mode is None
    c.add([1], vectors=_vecs(rng, 1))
    c.commit()
    assert c.index_mode == "FLAT-IP"


def test_default_index_can_be_disabled(db, rng):
    c = db.require_collection("nodflt", dim=8, drop_if_exists=True, default_index=None)
    c.add([1], vectors=_vecs(rng, 1))
    c.commit()
    assert c.index_mode is None


# ── index-build kwargs and aliases ──────────────────────────────────────


def test_bare_index_family_names_are_rejected(coll, rng):
    coll.add([1, 2, 3], vectors=_vecs(rng, 3))
    coll.commit()
    for bare in ("HNSW", "IVF", "DISKANN", "SPANN"):
        with pytest.raises((InvalidArgument, ValueError)):
            coll.build_index(bare)


def test_inapplicable_build_kwargs_are_filtered(coll, rng):
    coll.add(list(range(10)), vectors=_vecs(rng, 10))
    coll.commit()
    # n_clusters applies to IVF/SPANN only; on FLAT it must be ignored,
    # not rejected (reference filters per-family, index/mod.rs:510-648)
    coll.build_index("FLAT-L2", n_clusters=7)
    assert coll.index_mode == "FLAT-L2"


def test_build_index_then_remove_then_rebuild(coll, rng):
    x = _vecs(rng, 30)
    coll.add(list(range(30)), vectors=x)
    coll.commit()
    coll.build_index("IVF-L2", n_clusters=4)
    assert coll.index_mode == "IVF-L2"
    coll.remove_index()
    assert coll.index_mode == "FLAT-L2"  # reverts to the metric's flat mode
    res = coll.search(x[5], k=1)  # flat scan still serves searches
    assert int(res.ids[0]) == 5
    coll.build_index("HNSW-L2")
    assert coll.index_mode == "HNSW-L2"
    res = coll.search(x[5], k=1)
    assert int(res.ids[0]) == 5


# ── checkpoint / durability ─────────────────────────────────────────────


def test_checkpoint_allows_subsequent_writes(coll, rng):
    coll.add([1], vectors=_vecs(rng, 1))
    coll.checkpoint()
    coll.add([2], vectors=_vecs(rng, 1))
    coll.commit()
    assert coll.shape[0] == 2


def test_checkpoint_then_reopen_preserves_rows(tmp_root, rng):
    client = lynse.VectorDBClient(tmp_root)
    db = client.create_database("ckpt")
    c = db.require_collection("c", dim=8)
    x = _vecs(rng, 12)
    c.add(list(range(12)), vectors=x)
    c.checkpoint()
    client.close()

    client2 = lynse.VectorDBClient(tmp_root)
    c2 = client2.get_database("ckpt").get_collection("c")
    assert c2.shape == (12, 8)
    res = c2.search(x[4], k=1)
    assert int(res.ids[0]) == 4
    client2.close()


# ── delete / restore / compact invariants ───────────────────────────────


def test_delete_already_deleted_is_idempotent(coll, rng):
    coll.add(list(range(6)), vectors=_vecs(rng, 6))
    coll.commit()
    assert coll.delete([2, 3]) == 2
    assert coll.delete([2, 3]) == 0
    assert sorted(coll.list_deleted_ids()) == [2, 3]


def test_restore_nonexistent_id_not_in_tombstone(coll, rng):
    coll.add(list(range(4)), vectors=_vecs(rng, 4))
    coll.commit()
    coll.delete([1])
    coll.restore([999])  # noop
    assert coll.list_deleted_ids() == [1]


def test_deleted_excluded_from_stats_and_search(coll, rng):
    x = _vecs(rng, 10)
    coll.add(list(range(10)), vectors=x)
    coll.commit()
    coll.delete([0, 1, 2])
    st = coll.stats()
    assert st["live_rows"] == 7 and st["deleted_rows"] == 3
    res = coll.search(x[0], k=10)
    assert {0, 1, 2}.isdisjoint({int(i) for i in res.ids})


def test_compact_contracts(coll, rng):
    x = _vecs(rng, 10)
    coll.add(list(range(10)), vectors=x)
    coll.commit()
    coll.delete([4, 5, 6])
    removed = coll.compact()
    assert removed == 3
    assert coll.shape[0] == 7
    assert coll.list_deleted_ids() == []  # tombstone cleared
    assert coll.compact() == 0  # second compact is a noop
    # survivors still searchable under their original external IDs
    res = coll.search(x[8], k=1)
    assert int(res.ids[0]) == 8


# ── upsert field preservation ───────────────────────────────────────────


def test_upsert_updates_without_growing_shape(coll, rng):
    x = _vecs(rng, 5)
    coll.add(list(range(5)), vectors=x)
    coll.commit()
    coll.upsert([2], vectors=_vecs(rng, 1))
    coll.commit()
    assert coll.shape[0] == 5


def test_upsert_without_fields_preserves_existing_fields(coll, rng):
    coll.add([1], vectors=_vecs(rng, 1), fields=[{"tag": "keep", "n": 7}])
    coll.commit()
    coll.upsert([1], vectors=_vecs(rng, 1))
    coll.commit()
    got = coll.query(filter_ids=[1])
    assert got.fields[0]["tag"] == "keep" and got.fields[0]["n"] == 7


def test_upsert_mixes_update_and_insert(coll, rng):
    coll.add([1, 2], vectors=_vecs(rng, 2))
    coll.commit()
    coll.upsert([2, 3], vectors=_vecs(rng, 2))
    coll.commit()
    assert coll.shape[0] == 3
    assert coll.is_id_exists(3)


# ── head/tail defaults and over-size ────────────────────────────────────


def test_head_tail_default_n_and_oversize(coll, rng):
    x = _vecs(rng, 8)
    coll.add(list(range(8)), vectors=x)
    coll.commit()
    assert [int(i) for i in coll.head().ids] == [0, 1, 2, 3, 4]
    assert [int(i) for i in coll.tail().ids] == [3, 4, 5, 6, 7]
    assert len(coll.head(100).ids) == 8
    assert len(coll.tail(100).ids) == 8


# ── misc surface contracts ──────────────────────────────────────────────


def test_repr_reports_name_shape_mode(coll, rng):
    coll.add([1], vectors=_vecs(rng, 1))
    coll.commit()
    r = repr(coll)
    assert "contracts" in r and "(1, 8)" in r and "FLAT-IP" in r


def test_blob_rejects_non_bytes(coll):
    with pytest.raises(TypeError):
        coll.write_blob("k", "not-bytes")
    with pytest.raises(TypeError):
        coll.write_blob("k", 12345)


def test_list_fields_reflects_schema(coll, rng):
    coll.add([1, 2], vectors=_vecs(rng, 2),
             fields=[{"a": 1, "b": "x"}, {"a": 2, "c": 3.5}])
    coll.commit()
    assert {"a", "b", "c"} <= set(coll.list_fields())


def test_update_description_roundtrip(coll):
    assert coll.description is None
    coll.update_description("hello contracts")
    assert coll.description == "hello contracts"


def test_stats_after_compact(coll, rng):
    coll.add(list(range(6)), vectors=_vecs(rng, 6))
    coll.commit()
    coll.delete([0])
    coll.compact()
    st = coll.stats()
    assert st["rows"] == 5 and st["deleted_rows"] == 0
