"""Public-API edge contracts: invalid-argument surfaces, close semantics,
snapshot/import name collisions, and end-to-end scenarios.

Mirrors the behavior matrix of the reference's edge/scenario suites
(reference: tests/standard_tests/test_public_api_edges.py:18-239,
tests/standard_tests/test_public_api_scenarios.py:11-193) against this
repo's contracts.
"""

import numpy as np
import pytest

import lynsedb_tpu as lynse
from lynsedb_tpu.engine.errors import CollectionClosed, InvalidArgument


@pytest.fixture
def coll(db):
    return db.require_collection("edges", dim=4, drop_if_exists=True)


def v(n=1, dim=4, fill=1.0):
    return np.full((n, dim), fill, dtype=np.float32)


# ── add() validation ─────────────────────────────────────────────────────


@pytest.mark.parametrize(
    "bad_id,exc",
    [
        (True, TypeError),
        (1.5, TypeError),
        (-3, ValueError),
        ("", ValueError),
        (None, TypeError),
    ],
)
def test_add_rejects_invalid_public_ids(coll, bad_id, exc):
    with pytest.raises(exc):
        coll.add([bad_id], vectors=v(1))


@pytest.mark.parametrize(
    "bad_ids,exc",
    [
        ([], ValueError),
        ({1: "x"}, TypeError),
        ([1, True], TypeError),
        ([1, -1], ValueError),
    ],
)
def test_add_rejects_invalid_id_sequences(coll, bad_ids, exc):
    with pytest.raises(exc):
        coll.add(bad_ids, vectors=v(2))


def test_add_rejects_single_vector_for_multiple_ids(coll):
    with pytest.raises(ValueError):
        coll.add([1, 2], vectors=np.ones(4, dtype=np.float32))


def test_add_rejects_vector_row_count_mismatch(coll):
    with pytest.raises(ValueError):
        coll.add([1, 2, 3], vectors=v(2))


def test_add_rejects_fields_dict_for_multiple_records(coll):
    # one bare dict is only valid for a single record
    with pytest.raises(ValueError):
        coll.add([1, 2], vectors=v(2), fields={"x": 1})


def test_add_rejects_field_count_mismatch(coll):
    with pytest.raises(ValueError):
        coll.add([1, 2], vectors=v(2), fields=[{"x": 1}])


def test_add_rejects_non_dict_field_entries(coll):
    with pytest.raises(TypeError):
        coll.add([1], vectors=v(1), fields=["not-a-dict"])


def test_add_rejects_document_count_mismatch(coll):
    with pytest.raises(ValueError):
        coll.add([1, 2], vectors=v(2), documents=["only one"])


def test_add_rejects_missing_vectors_and_documents(coll):
    with pytest.raises(ValueError):
        coll.add([1])


def test_add_without_ids_rejects_empty_vector_matrix(coll):
    with pytest.raises(ValueError):
        coll.add(vectors=np.zeros((0, 4), dtype=np.float32))


@pytest.mark.parametrize("bad", [0, -1, 1.5, "16"])
def test_add_rejects_invalid_batch_size(coll, bad):
    with pytest.raises(ValueError):
        coll.add([1], vectors=v(1), batch_size=bad)


def test_add_rejects_non_string_documents(coll):
    with pytest.raises(TypeError):
        coll.add([1], vectors=v(1), documents=[42])


# ── upsert() validation ──────────────────────────────────────────────────


def test_upsert_rejects_duplicate_ids_before_mutating(coll):
    coll.add([1], vectors=v(1, fill=7.0))
    with pytest.raises(InvalidArgument):
        coll.upsert([2, 2], vectors=v(2))
    # nothing mutated: no new rows, original vector intact
    assert list(coll.query(return_ids_only=True)) == [1]
    got = coll.query_vectors(filter_ids=[1]).vectors
    np.testing.assert_allclose(got[0], np.full(4, 7.0), rtol=1e-6)


def test_upsert_int_and_string_ids_are_distinct(coll):
    coll.upsert([1, "1"], vectors=np.stack([np.ones(4), 2 * np.ones(4)]).astype(np.float32))
    ids = set(coll.query(return_ids_only=True).tolist())
    assert ids == {1, "1"}


# ── query()/delete()/restore() edges ─────────────────────────────────────


@pytest.mark.parametrize("bad", [True, -5, "", 3.5])
def test_query_filter_ids_rejects_invalid_id(coll, bad):
    coll.add([1], vectors=v(1))
    with pytest.raises((InvalidArgument, TypeError, ValueError)):
        coll.query(filter_ids=[bad])


def test_query_filter_ids_ignores_missing(coll):
    coll.add([1, 2], vectors=v(2))
    assert list(coll.query(filter_ids=[2, 999]).ids) == [2]


def test_delete_restore_ignore_missing_ids_without_error(coll):
    coll.add([1], vectors=v(1))
    assert coll.delete([999, "ghost"]) == 0
    assert coll.restore([999, "ghost"]) == 0
    assert coll.delete([1, 999]) == 1
    assert coll.restore([1, 999]) == 1


def test_query_vectors_filter_ids_rejects_invalid_id(coll):
    coll.add([1], vectors=v(1))
    coll.commit()
    with pytest.raises(InvalidArgument):
        coll.query_vectors(filter_ids=[False])


def test_search_ids_preserve_string_int_distinction(coll):
    # a numeric string id must come back as a string, not be parsed to int
    coll.add([1, "1"], vectors=np.stack([np.ones(4), -np.ones(4)]).astype(np.float32))
    coll.commit()
    res = coll.search(np.ones(4, dtype=np.float32), k=2)
    kinds = {type(x) for x in res.ids.tolist()}
    assert kinds == {int, str}


# ── sparse-vector id contracts ───────────────────────────────────────────


def test_sparse_vector_operations_reject_missing_ids(coll):
    coll.add([1], vectors=v(1))
    with pytest.raises(InvalidArgument):
        coll.add_sparse_vectors([{0: 1.0}], [777])


# ── snapshot / export name-collision contracts ───────────────────────────


def test_restore_collection_rejects_existing_name(db, coll, tmp_path):
    coll.add([1], vectors=v(1))
    coll.commit()
    snap = tmp_path / "snap"
    db.snapshot_collection("edges", snap)
    with pytest.raises(InvalidArgument):
        db.restore_collection(snap, "edges")
    restored = db.restore_collection(snap, "edges_copy")
    assert list(restored.query(return_ids_only=True)) == [1]


def test_import_collection_rejects_existing_name(db, coll, tmp_path):
    coll.add([1], vectors=v(1), fields=[{"tag": "x"}])
    coll.commit()
    exp = tmp_path / "exp"
    db.export_collection("edges", exp)
    with pytest.raises(InvalidArgument):
        db.import_collection(exp, "edges")
    imported = db.import_collection(exp, "edges_imported")
    row = imported.query(where="tag = 'x'")
    assert list(row.ids) == [1]


# ── close semantics ──────────────────────────────────────────────────────


def test_collection_close_is_idempotent(coll):
    coll.add([1], vectors=v(1))
    coll.close()
    coll.close()  # second close is a no-op, not an error


def test_closed_collection_rejects_reads_and_writes(coll):
    coll.add([1], vectors=v(1))
    coll.commit()
    coll.close()
    with pytest.raises(CollectionClosed):
        coll.add([2], vectors=v(1))
    with pytest.raises(CollectionClosed):
        coll.search(np.ones(4, dtype=np.float32), k=1)
    with pytest.raises(CollectionClosed):
        coll.query()


def test_reopen_after_close_gets_live_collection(db, coll):
    coll.add([1], vectors=v(1))
    coll.commit()
    coll.close()
    fresh = db.get_collection("edges")
    assert list(fresh.query(return_ids_only=True)) == [1]
    fresh.add([2], vectors=v(1))
    assert len(fresh.query(return_ids_only=True)) == 2


# ── scenarios ────────────────────────────────────────────────────────────


def test_string_ids_round_trip_through_search_delete_restore_compact(coll):
    coll.add(["s1", "s2"], vectors=np.eye(2, 4, dtype=np.float32), fields=[{"t": 1}, {"t": 2}])
    coll.commit()
    top = coll.search(np.array([1, 0, 0, 0], dtype=np.float32), k=1)
    assert top.ids[0] == "s1"
    assert coll.delete(["s1"]) == 1
    assert set(coll.query(return_ids_only=True).tolist()) == {"s2"}
    assert coll.restore(["s1"]) == 1
    coll.compact()
    after = coll.query(filter_ids=["s1"])
    assert list(after.ids) == ["s1"]
    assert after.fields[0]["t"] == 1


def test_auto_ids_after_string_only_adds_start_from_zero(coll):
    coll.add(["a", "b"], vectors=v(2))
    out = coll.add(vectors=v(2, fill=2.0))
    assert out == [0, 1]
    # and a later explicit int id cannot collide silently
    with pytest.raises(InvalidArgument):
        coll.add([0], vectors=v(1))


def test_drop_and_recreate_collection_resets_data_and_description(db):
    first = db.require_collection("reset_me", dim=4, description="first")
    first.add([1, 2, 3], vectors=v(3))
    first.commit()
    second = db.require_collection(
        "reset_me", dim=4, drop_if_exists=True, description="second"
    )
    assert len(second.query(return_ids_only=True)) == 0
    assert second.description == "second"


def test_update_description_persists_across_reopen(db, coll, tmp_root):
    coll.update_description("annotated")
    coll.commit()
    details = db.show_collections_details()
    assert details["edges"]["description"] == "annotated"
    ro = lynse.VectorDBClient(tmp_root, read_only=True)
    rodb = ro.get_database("test_db")
    assert rodb.get_collection("edges").description == "annotated"


def test_database_snapshot_restore_preserves_multiple_collections(client, db, tmp_path):
    a = db.require_collection("multi_a", dim=4)
    a.add([1], vectors=v(1))
    a.commit()
    b = db.require_collection("multi_b", dim=4)
    b.add(["x"], vectors=v(1, fill=3.0))
    b.commit()
    snap = tmp_path / "dbsnap"
    db.snapshot_database(snap)
    restored_root = tmp_path / "restored_root"
    c2 = lynse.VectorDBClient(str(restored_root))
    db2 = c2.restore_database(snap, "restored_db")
    names = set(db2.show_collections())
    assert {"multi_a", "multi_b"} <= names
    assert list(db2.get_collection("multi_a").query(return_ids_only=True)) == [1]
    assert list(db2.get_collection("multi_b").query(return_ids_only=True)) == ["x"]


def test_local_restore_bad_path_preserves_database(tmp_path, rng):
    """LocalClient.restore_database(overwrite=True) must validate the
    snapshot path BEFORE dropping the existing database."""
    import numpy as np

    import lynsedb_tpu as lynse

    client = lynse.VectorDBClient(str(tmp_path))
    db = client.create_database("resdb", drop_if_exists=True)
    coll = db.require_collection("c", dim=4, drop_if_exists=True)
    coll.add([1, 2], vectors=rng.normal(size=(2, 4)).astype(np.float32))
    coll.commit()
    with pytest.raises(Exception, match="snapshot"):
        db.restore_database(str(tmp_path / "no_such_snap"), overwrite=True)
    assert db.database_exists()
    assert client.get_database("resdb").get_collection("c").shape[0] == 2
