"""Read-only mode contracts (reference:
tests/standard_tests/test_public_api_scenarios.py:130
test_read_only_client_can_read_but_rejects_writes, engine.rs:1629
open_read_only semantics). Every mutating client method must raise
RuntimeError mentioning "read-only"; every read path must serve."""

import numpy as np
import pytest

import lynsedb_tpu as lynse

DIM = 8


@pytest.fixture()
def seeded_root(tmp_path):
    root = str(tmp_path / "ro_root")
    writer = lynse.VectorDBClient(root)
    db = writer.create_database("rodb", drop_if_exists=True)
    coll = db.require_collection("items", dim=DIM, drop_if_exists=True)
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(6, DIM)).astype(np.float32)
    coll.add(list(range(1, 7)), vectors=vecs,
             fields=[{"tag": "stored", "i": i} for i in range(6)])
    coll.write_blob("artifact", b"stored bytes")
    coll.commit()
    writer.close()
    return root, vecs


@pytest.fixture()
def ro_coll(seeded_root):
    root, vecs = seeded_root
    reader = lynse.VectorDBClient(root, read_only=True)
    coll = reader.get_database("rodb").get_collection("items", warm_up=False)
    yield coll, vecs
    reader.close()


def test_read_only_flags(seeded_root):
    root, _ = seeded_root
    reader = lynse.VectorDBClient(root, read_only=True)
    assert reader.is_read_only is True
    coll = reader.get_database("rodb").get_collection("items", warm_up=False)
    assert coll.is_read_only is True
    reader.close()
    writer = lynse.VectorDBClient(root)
    assert writer.is_read_only is False
    writer.close()


def test_read_paths_serve(ro_coll):
    coll, vecs = ro_coll
    res = coll.search(vecs[0], k=1)
    assert res.ids.tolist() == [1]
    q = coll.query(filter_ids=[1])
    assert q.fields[0]["tag"] == "stored"
    assert coll.read_blob("artifact") == b"stored bytes"
    assert coll.read_blob_range("artifact", 0, 6) == b"stored"
    assert coll.shape[0] == 6


@pytest.mark.parametrize("call", [
    lambda c, v: c.add([9], vectors=v[:1]),
    lambda c, v: c.delete([1]),
    lambda c, v: c.update_fields([1], [{"tag": "new"}]),
    lambda c, v: c.write_blob("artifact", b"replacement"),
    lambda c, v: c.delete_blob("artifact"),
    lambda c, v: c.build_index("FLAT-L2"),
    lambda c, v: c.update_description("nope"),
], ids=["add", "delete", "update_fields", "write_blob", "delete_blob",
        "build_index", "update_description"])
def test_writes_rejected(ro_coll, call):
    coll, vecs = ro_coll
    with pytest.raises(RuntimeError, match="read-only"):
        call(coll, vecs)
    # reads still work after the rejected write
    assert coll.search(vecs[0], k=1).ids.tolist() == [1]


def test_db_level_writes_rejected(seeded_root):
    root, _ = seeded_root
    reader = lynse.VectorDBClient(root, read_only=True)
    db = reader.get_database("rodb")
    with pytest.raises(RuntimeError, match="read-only"):
        db.drop_collection("items")
    with pytest.raises(RuntimeError, match="read-only"):
        db.require_collection("fresh", dim=DIM)
    reader.close()


def test_read_only_error_is_runtime_and_lynse_error(ro_coll):
    """The reference binding maps engine errors to RuntimeError
    (src/python/mod.rs:828); ours must satisfy both except-clauses."""
    from lynsedb_tpu.engine.errors import LynseError, ReadOnly

    coll, vecs = ro_coll
    with pytest.raises(ReadOnly):
        coll.add([9], vectors=vecs[:1])
    assert issubclass(ReadOnly, RuntimeError)
    assert issubclass(LynseError, RuntimeError)


def test_two_readers_share_without_lock(seeded_root):
    """read-only clients take no manager file lock (engine.rs read-only
    open does not contend with the writer lock)."""
    root, vecs = seeded_root
    r1 = lynse.VectorDBClient(root, read_only=True)
    r2 = lynse.VectorDBClient(root, read_only=True)
    c1 = r1.get_database("rodb").get_collection("items", warm_up=False)
    c2 = r2.get_database("rodb").get_collection("items", warm_up=False)
    assert c1.search(vecs[1], k=1).ids.tolist() == c2.search(vecs[1], k=1).ids.tolist()
    r1.close()
    r2.close()


def test_read_only_streaming_lazy_pq_does_not_write(tmp_path, monkeypatch):
    """A read-only open of a resident-built DiskANN index over a corpus
    that now streams must lazily fit its PQ tier in memory WITHOUT writing
    to the index directory."""
    import numpy as np

    import lynsedb_tpu.ops.scan as scan_mod

    root = str(tmp_path / "ro_stream")
    rng = np.random.default_rng(0)
    data = rng.normal(size=(3000, 16)).astype(np.float32)
    w = lynse.VectorDBClient(root)
    db = w.create_database("d", drop_if_exists=True)
    coll = db.require_collection("c", dim=16, default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index("DISKANN-IP")
    w.close()

    monkeypatch.setattr(scan_mod, "HBM_BYTES", 16 * 1024)
    r = lynse.VectorDBClient(root, read_only=True)
    rcoll = r.get_database("d").get_collection("c", warm_up=False)
    idx_dir = rcoll._engine.root / "index"
    before = {p.name: p.stat().st_mtime for p in idx_dir.iterdir()}
    res = rcoll.search(data[0], k=5, nprobe=64)
    assert 0 in [int(x) for x in res.ids.tolist()]
    after = {p.name: p.stat().st_mtime for p in idx_dir.iterdir()}
    assert before == after, "read-only search must not touch the index dir"
    r.close()
