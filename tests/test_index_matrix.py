"""Per-index-family x per-metric contract matrix through the client API.

Extends the FLAT-only metric matrix (test_search_matrix.py) across the ANN
families the way the reference's standard suite does (reference:
tests/standard_tests/test_search.py — per-mode search/filter/batch/delete
contracts for HNSW/DiskANN/IVF/SPANN variants). ANN recall floors live in
test_gates.py; here every assertion is a hard behavioral contract that must
hold regardless of recall: filters never leak, deletes never resurface,
batch == loop, incremental inserts become searchable after commit, and
persisted indexes survive reopen.
"""

import numpy as np
import pytest

import lynsedb_tpu as lynse

FAMILIES = [
    # (mode template, build kwargs, search kwargs)
    ("IVF-{m}", {"n_clusters": 16}, {"nprobe": 16}),
    ("SPANN-{m}", {"n_clusters": 16, "replica_count": 2}, {"nprobe": 16}),
    ("HNSW-{m}", {}, {"nprobe": 64}),
    ("DISKANN-{m}", {}, {"nprobe": 64}),
]
METRICS = ["IP", "L2", "COS"]
CASES = [(t.format(m=m), bkw, skw) for t, bkw, skw in FAMILIES for m in METRICS]
IDS = [c[0] for c in CASES]

N, DIM = 400, 24


@pytest.fixture(scope="module")
def idx_db(tmp_path_factory):
    client = lynse.VectorDBClient(str(tmp_path_factory.mktemp("idxmat") / "db"))
    db = client.create_database("m")
    yield db
    client.close()


def _clustered(rng, n, dim):
    centers = rng.uniform(0, 20, size=(8, dim)).astype(np.float32)
    cid = rng.integers(0, 8, size=n)
    return (centers[cid] + rng.normal(0, 1.5, size=(n, dim))).astype(np.float32)


@pytest.fixture(scope="module")
def built(idx_db):
    """One collection per mode, built once for the whole matrix. IP modes
    get unit-normalized rows (the MIPS winner for raw clustered data is a
    high-norm hub, not the query row, so self-hit contracts only hold on
    the unit sphere — the same convention as BASELINE's DISKANN-IP)."""
    out = {}
    rng = np.random.default_rng(42)
    raw = _clustered(rng, N, DIM)
    unit = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    for mode, bkw, skw in CASES:
        x = unit if mode.endswith("-IP") else raw
        coll = idx_db.require_collection(
            f"c_{mode.lower().replace('-', '_')}", dim=DIM, drop_if_exists=True)
        coll.add(list(range(N)), vectors=x,
                 fields=[{"bucket": i % 4} for i in range(N)])
        coll.commit()
        coll.build_index(mode, **bkw)
        out[mode] = (coll, x, skw)
    return out


@pytest.mark.parametrize("mode,bkw,skw", CASES, ids=IDS)
def test_index_mode_reports(built, mode, bkw, skw):
    coll, _, _ = built[mode]
    assert coll.index_mode == mode


@pytest.mark.parametrize("mode,bkw,skw", CASES, ids=IDS)
def test_self_query_hits_self(built, mode, bkw, skw):
    coll, x, s = built[mode]
    hits = 0
    for i in (3, 77, 200):
        res = coll.search(x[i], k=5, **s)
        hits += int(i in [int(j) for j in res.ids])
    assert hits >= 2  # the row itself must rank for nearly every query


@pytest.mark.parametrize("mode,bkw,skw", CASES, ids=IDS)
def test_filter_never_leaks(built, mode, bkw, skw):
    coll, x, s = built[mode]
    res = coll.search(x[5], k=20, where="bucket = 1", **s)
    assert len(res.ids) > 0
    assert all(int(i) % 4 == 1 for i in res.ids)


@pytest.mark.parametrize("mode,bkw,skw", CASES, ids=IDS)
def test_empty_filter_returns_nothing(built, mode, bkw, skw):
    coll, x, s = built[mode]
    res = coll.search(x[5], k=10, where="bucket = 99", **s)
    assert len(res.ids) == 0


@pytest.mark.parametrize("mode,bkw,skw", CASES, ids=IDS)
def test_batch_equals_loop(built, mode, bkw, skw):
    coll, x, s = built[mode]
    qs = x[10:14]
    batch = coll.batch_search(qs, k=5, **s)
    for i in range(len(qs)):
        single = coll.search(qs[i], k=5, **s)
        assert [int(v) for v in batch[i].ids] == [int(v) for v in single.ids]


@pytest.mark.parametrize("mode,bkw,skw", CASES, ids=IDS)
def test_delete_is_excluded_and_restore_returns(built, mode, bkw, skw):
    coll, x, s = built[mode]
    victim = 123
    coll.delete([victim])
    coll.commit()
    res = coll.search(x[victim], k=30, **s)
    assert victim not in [int(i) for i in res.ids]
    coll.restore([victim])
    coll.commit()
    res = coll.search(x[victim], k=30, **s)
    assert victim in [int(i) for i in res.ids]


@pytest.mark.parametrize("mode,bkw,skw", CASES, ids=IDS)
def test_incremental_insert_searchable(built, mode, bkw, skw):
    coll, x, s = built[mode]
    rng = np.random.default_rng(hash(mode) % 2**31)
    new = (x[7] + rng.normal(0, 0.02, size=DIM)).astype(np.float32)
    if mode.endswith("-IP"):
        new = (new / np.linalg.norm(new) * 1.05).astype(np.float32)  # slight norm edge
    nid = N + (hash(mode) % 1000)
    coll.add([nid], vectors=new.reshape(1, -1), fields=[{"bucket": 0}])
    coll.commit()
    res = coll.search(new, k=10, **s)
    assert nid in [int(i) for i in res.ids]


@pytest.mark.parametrize("mode,bkw,skw",
                         [c for c in CASES if c[0].startswith(("HNSW", "DISKANN"))],
                         ids=[c[0] for c in CASES if c[0].startswith(("HNSW", "DISKANN"))])
def test_k_exceeds_live_rows(built, mode, bkw, skw):
    coll, x, s = built[mode]
    res = coll.search(x[0], k=10_000, **s)
    assert len(res.ids) <= coll.shape[0]
    assert len(set(int(i) for i in res.ids)) == len(res.ids)  # no dups


def test_index_survives_reopen(tmp_path, rng):
    """Persisted ANN indexes load back and serve (per family)."""
    root = str(tmp_path / "persist")
    client = lynse.VectorDBClient(root)
    db = client.create_database("p")
    x = _clustered(np.random.default_rng(7), 300, DIM)
    for mode, bkw, _ in FAMILIES:
        mode = mode.format(m="L2")
        coll = db.require_collection(f"c_{mode.lower().replace('-', '_')}",
                                     dim=DIM, drop_if_exists=True)
        coll.add(list(range(300)), vectors=x)
        coll.commit()
        coll.build_index(mode, **bkw)
    client.close()

    re = lynse.VectorDBClient(root)
    rdb = re.get_database("p")
    for mode, _, skw in FAMILIES:
        mode = mode.format(m="L2")
        coll = rdb.get_collection(f"c_{mode.lower().replace('-', '_')}")
        assert coll.index_mode == mode
        res = coll.search(x[9], k=5, **skw)
        assert 9 in [int(i) for i in res.ids]
    re.close()
