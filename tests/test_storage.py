"""Storage-plane tests: WAL replay, torn tails, vector store journal,
bitset, id map, crash recovery at the engine level."""

import numpy as np
import pytest

from lynsedb_tpu.engine.collection import Collection
from lynsedb_tpu.storage.bitset import BitSet
from lynsedb_tpu.storage.idmap import IdMap
from lynsedb_tpu.storage.vector_store import VectorStore
from lynsedb_tpu.storage.wal import KIND_ADD, WALStorage


def test_bitset_roundtrip():
    bs = BitSet()
    for i in (0, 5, 63, 64, 130):
        bs.set(i)
    bs.set(5, False)
    assert bs.get(0) and not bs.get(5) and bs.get(130)
    assert bs.count() == 4
    bs2 = BitSet.from_bytes(bs.to_bytes())
    assert bs2.to_bool_array(131).tolist() == bs.to_bool_array(131).tolist()
    arr = np.zeros(10, dtype=bool)
    arr[3] = True
    bs3 = BitSet.from_bool_array(arr)
    assert bs3.get(3) and not bs3.get(2)


def test_vector_store_append_read(tmp_path, rng):
    vs = VectorStore(tmp_path / "v", dim=8)
    rows = rng.normal(size=(100, 8)).astype(np.float32)
    vs.append(rows[:60])
    vs.append(rows[60:])
    vs.checkpoint()
    np.testing.assert_allclose(vs.read_all(), rows, rtol=1e-6)
    np.testing.assert_allclose(vs.row(42), rows[42], rtol=1e-6)


def test_vector_store_crash_trims_unpublished_tail(tmp_path, rng):
    rows = rng.normal(size=(10, 4)).astype(np.float32)
    vs = VectorStore(tmp_path / "v", dim=4)
    vs.append(rows[:6])
    vs.checkpoint()
    vs.append(rows[6:])  # no checkpoint — simulated crash
    vs2 = VectorStore(tmp_path / "v", dim=4)
    assert vs2.row_count == 6
    np.testing.assert_allclose(vs2.read_all(), rows[:6], rtol=1e-6)


def test_vector_store_overwrite_journal(tmp_path, rng):
    rows = rng.normal(size=(5, 4)).astype(np.float32)
    vs = VectorStore(tmp_path / "v", dim=4)
    vs.append(rows)
    vs.checkpoint()
    new = np.ones((1, 4), dtype=np.float32)
    vs.overwrite_rows(np.array([2]), new)
    np.testing.assert_allclose(vs.row(2), new[0])
    vs2 = VectorStore(tmp_path / "v", dim=4)
    np.testing.assert_allclose(vs2.row(2), new[0])


def test_vector_store_compact(tmp_path, rng):
    rows = rng.normal(size=(10, 4)).astype(np.float32)
    vs = VectorStore(tmp_path / "v", dim=4)
    vs.append(rows)
    vs.checkpoint()
    keep = np.ones(10, dtype=bool)
    keep[[2, 5]] = False
    mapping = vs.compact_rows(keep)
    assert vs.row_count == 8
    assert mapping[2] == -1 and mapping[3] == 2
    np.testing.assert_allclose(vs.row(2), rows[3], rtol=1e-6)


def test_wal_replay_and_torn_tail(tmp_path):
    wal = WALStorage(tmp_path / "wal", dim=4)
    v = np.arange(8, dtype=np.float32).reshape(2, 4)
    wal.log_add([0, 1], v, [10, 11], [{"a": 1}, {"a": 2}])
    wal.log_add([2], v[:1], [12], None)
    wal.sync()
    records = list(wal.replay())
    assert len(records) == 2
    kind, payload = records[0]
    assert kind == KIND_ADD and payload["iids"] == [0, 1]
    # torn tail: truncate mid-record
    seg = sorted((tmp_path / "wal").glob("wal-*.log"))[-1]
    raw = seg.read_bytes()
    seg.write_bytes(raw[:-3])
    wal2 = WALStorage(tmp_path / "wal", dim=4)
    assert len(list(wal2.replay())) == 1
    wal2.cleanup()
    assert not wal2.has_pending()


def test_idmap_roundtrip(tmp_path):
    im = IdMap(tmp_path / "ids")
    im.insert("a", 0)
    im.insert(7, 1)
    im.insert("b", 2)
    im.remove("a")
    im.close()
    im2 = IdMap(tmp_path / "ids")
    assert im2.get_internal("a") is None
    assert im2.get_internal(7) == 1
    assert im2.get_external(2) == "b"
    assert im2.max_int_id() == 7
    im2.checkpoint()
    im2.close()
    im3 = IdMap(tmp_path / "ids")
    assert im3.get_internal("b") == 2


def test_engine_crash_recovery_via_wal(tmp_path, rng):
    """Simulated hard crash: engine never flushed or closed; reopen must
    replay the WAL and restore rows + fields + external ids."""
    vecs = rng.normal(size=(5, 4)).astype(np.float32)
    coll = Collection(tmp_path / "c", "c", dim=4)
    coll.add_records(vecs, ["a", "b", "c", "d", "e"], [{"i": i} for i in range(5)])
    coll.delete_items(["b"])
    # abandon without close/commit (file handles leak — that's the point)

    coll2 = Collection(tmp_path / "c", "c")
    assert coll2.n_rows == 5
    assert coll2.idmap.get_internal("d") == 3
    assert coll2.tombstones.get(1)
    np.testing.assert_allclose(coll2.row_vector(4), vecs[4], rtol=1e-6)
    assert coll2.fields.retrieve(2) == {"i": 2}
    # recovered rows became durable: a third open has them without the WAL
    assert not coll2.wal.has_pending()
    coll2.close()


def test_engine_recovery_idempotent_after_partial_flush(tmp_path, rng):
    """Crash after a threshold flush but before checkpoint: WAL rows overlap
    durable rows; replay must not duplicate them."""
    vecs = rng.normal(size=(12_000, 4)).astype(np.float32)
    coll = Collection(tmp_path / "c", "c", dim=4)
    coll.add_records(vecs, list(range(12_000)), None)
    # pending auto-flushed at 10k; manifest not yet published for the rest
    coll2 = Collection(tmp_path / "c", "c")
    assert coll2.n_rows == 12_000
    np.testing.assert_allclose(coll2.row_vector(11_999), vecs[11_999], rtol=1e-6)
    coll2.close()
