"""Database- and client-level contracts mirrored from the reference
standard suite (reference: tests/standard_tests/test_database.py — dim
inference, require idempotence, descriptions, listing/dropping, reprs,
same-root reopen)."""

import numpy as np
import pytest

import lynsedb_tpu as lynse
from lynsedb_tpu.engine.errors import CollectionNotFound


def test_client_and_db_repr(client, db, tmp_root):
    assert tmp_root in repr(client)
    assert "test_db" in repr(db)


def test_require_collection_without_dim_infers_from_first_vectors(db, rng):
    coll = db.require_collection("nodim", drop_if_exists=True)
    assert coll.dim is None
    coll.add([1, 2], vectors=rng.normal(size=(2, 6)).astype(np.float32))
    coll.commit()
    assert coll.dim == 6
    assert coll.shape == (2, 6)


def test_require_collection_same_dim_twice_is_idempotent(db, rng):
    c1 = db.require_collection("idem", dim=4, drop_if_exists=True)
    c1.add([1], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    c1.commit()
    c2 = db.require_collection("idem", dim=4)
    assert c2.shape == (1, 4)  # data preserved, same collection


def test_require_existing_collection_without_dim_preserves_dimension(db, rng):
    c1 = db.require_collection("keepdim", dim=5, drop_if_exists=True)
    c1.add([1], vectors=rng.normal(size=(1, 5)).astype(np.float32))
    c1.commit()
    c2 = db.require_collection("keepdim")
    assert c2.dim == 5


def test_require_collection_drop_if_exists_resets(db, rng):
    c1 = db.require_collection("reset", dim=4, drop_if_exists=True)
    c1.add([1], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    c1.commit()
    c2 = db.require_collection("reset", dim=4, drop_if_exists=True)
    assert c2.shape == (0, 4)


def test_require_collection_with_description(db):
    c = db.require_collection("desc", dim=4, drop_if_exists=True,
                              description="my collection")
    assert c.description == "my collection"
    assert db.show_collections_details()["desc"]["description"] == "my collection"


def test_get_collection_nonexistent_raises(db):
    with pytest.raises(CollectionNotFound):
        db.get_collection("does_not_exist")
    # the error maps to RuntimeError like the reference binding
    with pytest.raises(RuntimeError):
        db.get_collection("does_not_exist")


def test_show_collections_details_shape(db, rng):
    c = db.require_collection("det", dim=3, drop_if_exists=True)
    c.add([1], vectors=rng.normal(size=(1, 3)).astype(np.float32))
    c.commit()
    det = db.show_collections_details()["det"]
    assert det["dim"] == 3
    assert det["dtype"] == "float32"
    assert det["index_mode"] == "FLAT-IP"


def test_collection_not_in_list_after_drop(db):
    db.require_collection("gone", dim=2, drop_if_exists=True)
    assert "gone" in db.show_collections()
    db.drop_collection("gone")
    assert "gone" not in db.show_collections()


def test_database_not_in_list_after_drop(client):
    client.create_database("victim", drop_if_exists=True)
    assert "victim" in client.list_databases()
    client.drop_database("victim")
    assert "victim" not in client.list_databases()


def test_database_exists_flag(client):
    db = client.create_database("flagdb", drop_if_exists=True)
    assert db.database_exists()
    db.drop_database()
    assert not db.database_exists()


def test_reopen_same_root_in_process(tmp_root, rng):
    c1 = lynse.VectorDBClient(tmp_root)
    db1 = c1.create_database("shared")
    coll = db1.require_collection("c", dim=4)
    coll.add([1], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    coll.commit()
    # a second client on the same root sees the same state in-process
    c2 = lynse.VectorDBClient(tmp_root)
    got = c2.get_database("shared").get_collection("c")
    assert got.shape == (1, 4)
    c1.close()


def test_show_collections_empty_database(client):
    db = client.create_database("emptydb", drop_if_exists=True)
    assert db.show_collections() == []


def test_create_database_drop_if_exists_resets_collections(client, rng):
    db = client.create_database("resetdb", drop_if_exists=True)
    coll = db.require_collection("c", dim=4)
    coll.add([1], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    coll.commit()
    db2 = client.create_database("resetdb", drop_if_exists=True)
    assert db2.show_collections() == []
