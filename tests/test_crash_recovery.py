"""Crash-recovery fuzz: random write workloads, a simulated crash at an
arbitrary moment (directory snapshot without close), reopen, and invariant
checks (reference: engine.rs recovery tests around :1760-1785 + wal.rs crash
replay tests — the recovery contract is: everything since the last durable
boundary replays from the WAL; nothing committed is ever lost)."""

import shutil

import numpy as np
import pytest

import lynsedb_tpu as lynse


def _snapshot_dir(src, dst):
    """Simulate a crash: copy the live directory as-is (no close/flush)."""
    shutil.copytree(src, dst)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_workload_crash_reopen(tmp_path, seed):
    rng = np.random.default_rng(seed)
    root = tmp_path / "live"
    client = lynse.VectorDBClient(str(root))
    coll = client.create_database("d").require_collection("c", dim=8)

    live: dict[int, np.ndarray] = {}   # expected surviving rows
    deleted: set[int] = set()
    next_id = 0
    committed_state: tuple[dict, set] = ({}, set())

    for step in range(60):
        op = rng.choice(["add", "upsert", "delete", "restore", "commit"],
                        p=[0.45, 0.15, 0.15, 0.05, 0.20])
        if op == "add":
            m = int(rng.integers(1, 30))
            vecs = rng.normal(size=(m, 8)).astype(np.float32)
            ids = list(range(next_id, next_id + m))
            coll.add(ids, vectors=vecs)
            for i, v in zip(ids, vecs):
                live[i] = v
            next_id += m
        elif op == "upsert" and live:
            pick = [int(k) for k in rng.choice(list(live), size=min(5, len(live)), replace=False)]
            vecs = rng.normal(size=(len(pick), 8)).astype(np.float32)
            coll.upsert(pick, vectors=vecs)
            for i, v in zip(pick, vecs):
                live[i] = v
                deleted.discard(i)
        elif op == "delete" and live:
            pick = [int(k) for k in rng.choice(list(live), size=min(3, len(live)), replace=False)]
            coll.delete(pick)
            deleted.update(pick)
        elif op == "restore" and deleted:
            pick = [int(k) for k in list(deleted)[:2]]
            coll.restore(pick)
            deleted.difference_update(pick)
        elif op == "commit":
            coll.commit()
            committed_state = (dict(live), set(deleted))

    # crash snapshot mid-flight (some operations since the last commit are
    # in the WAL only)
    crash_dir = tmp_path / f"crash_{seed}"
    _snapshot_dir(root, crash_dir)
    client.close()

    re_client = lynse.VectorDBClient(str(crash_dir))
    re_coll = re_client.get_database("d").get_collection("c")

    # invariant 1: every row from the last committed state is present with
    # the committed (or newer-WAL-replayed) vector
    committed_live, _ = committed_state
    n_live = re_coll.shape[0]
    assert n_live >= len(committed_live)

    # invariant 2: full-corpus search works post-recovery and never returns
    # a deleted id (deletes are WAL-logged, so even uncommitted deletes
    # survive the crash)
    if n_live:
        probe = rng.normal(size=8).astype(np.float32)
        res = re_coll.search(probe, k=min(50, n_live + 5))
        returned = set(int(i) for i in res.ids)
        assert not (returned & deleted), f"deleted ids leaked: {returned & deleted}"

    # invariant 3: recovered vectors match what was written (WAL replay is
    # byte-exact) for a sample of ids
    check = [i for i in list(live)[:10] if i not in deleted]
    if check:
        got = re_coll.query_vectors(filter_ids=check)
        got_map = {int(i): v for i, v in zip(got.ids, got.vectors)}
        for i in check:
            assert i in got_map
            np.testing.assert_allclose(got_map[i], live[i], rtol=1e-6)
    re_client.close()


def test_torn_wal_tail_at_engine_level(tmp_path, rng):
    """Truncating the WAL mid-record must not prevent reopen; fully-logged
    records before the tear replay, the torn record is dropped."""
    root = tmp_path / "torn"
    client = lynse.VectorDBClient(str(root))
    coll = client.create_database("d").require_collection("c", dim=4)
    vecs = rng.normal(size=(50, 4)).astype(np.float32)
    coll.add(list(range(50)), vectors=vecs)
    coll.commit()
    # uncommitted batch lands in the WAL
    coll.add(list(range(50, 80)), vectors=rng.normal(size=(30, 4)).astype(np.float32))
    client.close()

    crash = tmp_path / "torn_crash"
    shutil.copytree(root, crash)
    wal_files = sorted((crash / "d" / "c" / "wal").glob("*.log"))
    if wal_files:
        f = wal_files[-1]
        data = f.read_bytes()
        if len(data) > 20:
            f.write_bytes(data[: len(data) - 11])  # tear mid-record

    re_client = lynse.VectorDBClient(str(crash))
    re_coll = re_client.get_database("d").get_collection("c")
    # the 50 committed rows are inviolable; some of the 30 may have been
    # torn away — but never corrupted
    assert re_coll.shape[0] >= 50
    res = re_coll.search(vecs[7], k=5)
    assert len(res.ids) == 5
    re_client.close()


def test_double_reopen_is_stable(tmp_path, rng):
    """Recovery must be idempotent: reopening twice yields identical state."""
    root = tmp_path / "dbl"
    client = lynse.VectorDBClient(str(root))
    coll = client.create_database("d").require_collection("c", dim=4)
    coll.add(list(range(20)), vectors=rng.normal(size=(20, 4)).astype(np.float32))
    coll.commit()
    coll.add(list(range(20, 35)), vectors=rng.normal(size=(15, 4)).astype(np.float32))
    client.close()  # close flushes; then reopen twice

    c1 = lynse.VectorDBClient(str(root))
    n1 = c1.get_database("d").get_collection("c").shape[0]
    c1.close()
    c2 = lynse.VectorDBClient(str(root))
    n2 = c2.get_database("d").get_collection("c").shape[0]
    c2.close()
    assert n1 == n2 == 35
