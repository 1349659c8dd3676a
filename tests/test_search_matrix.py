"""End-to-end per-metric search coverage through the client API.

Mirrors the breadth of the reference's standard search suite
(reference: tests/standard_tests/test_search.py — per-metric ordering,
filtered no-leak, batch-vs-loop equivalence, edge cases, read-only
contracts) against this engine's FLAT-<METRIC> modes. The numpy references
in np_reference.py re-derive each metric contract independently.
"""

import numpy as np
import pytest

import lynsedb_tpu as lynse
from lynsedb_tpu.metrics import Metric

from np_reference import FNS

# (mode token, dim, data generator kind)
METRIC_CASES = [
    ("IP", 16, "normal"),
    ("L2", 16, "normal"),
    ("COSINE", 16, "normal"),
    ("L1", 16, "normal"),
    ("CHEBYSHEV", 16, "normal"),
    ("CANBERRA", 16, "normal"),
    ("BRAYCURTIS", 16, "positive"),
    ("CORRELATION", 16, "normal"),
    ("HELLINGER", 16, "positive"),
    ("WASSERSTEIN", 16, "positive"),
    ("JENSENSHANNON", 16, "positive"),
    ("HAMMING", 32, "binary"),
    ("JACCARD", 32, "binary"),
    ("DICE", 32, "binary"),
    ("TANIMOTO", 32, "binary"),
    ("HAVERSINE", 2, "geo"),
]

MODE_TO_METRIC = {
    "IP": "ip", "L2": "l2", "COSINE": "cosine", "L1": "l1",
    "CHEBYSHEV": "chebyshev", "CANBERRA": "canberra",
    "BRAYCURTIS": "bray_curtis", "CORRELATION": "correlation",
    "HELLINGER": "hellinger", "WASSERSTEIN": "wasserstein",
    "JENSENSHANNON": "jensen_shannon", "HAMMING": "hamming",
    "JACCARD": "jaccard", "DICE": "dice", "TANIMOTO": "tanimoto",
    "HAVERSINE": "haversine",
}


def _gen(kind: str, n: int, dim: int, rng) -> np.ndarray:
    if kind == "normal":
        return rng.normal(size=(n, dim)).astype(np.float32)
    if kind == "positive":
        return np.abs(rng.normal(size=(n, dim))).astype(np.float32) + 0.01
    if kind == "binary":
        return (rng.random(size=(n, dim)) > 0.5).astype(np.float32)
    if kind == "geo":
        lon = rng.uniform(-180, 180, size=(n, 1))
        lat = rng.uniform(-85, 85, size=(n, 1))
        return np.concatenate([lon, lat], axis=1).astype(np.float32)
    raise ValueError(kind)


def _ref_order(q: np.ndarray, x: np.ndarray, mode: str) -> np.ndarray:
    fn = FNS[MODE_TO_METRIC[mode]]
    scores = np.array([fn(q, row) for row in x], dtype=np.float64)
    ascending = mode != "IP"
    # stable order, id tiebreak toward lower index (engine contract)
    return np.lexsort((np.arange(len(x)), scores if ascending else -scores))


@pytest.fixture(scope="module")
def matrix_db(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("matrix") / "db")
    client = lynse.VectorDBClient(root)
    db = client.create_database("m")
    yield db
    client.close()


def _make_coll(db, mode: str, dim: int, kind: str, rng, n: int = 200):
    coll = db.require_collection(f"c_{mode.lower()}", dim=dim, drop_if_exists=True)
    x = _gen(kind, n, dim, rng)
    coll.add(list(range(n)), vectors=x, fields=[{"bucket": i % 4} for i in range(n)])
    coll.commit()
    coll.build_index(f"FLAT-{mode}")
    return coll, x


@pytest.mark.parametrize("mode,dim,kind", METRIC_CASES)
def test_metric_topk_order_matches_numpy(mode, dim, kind, matrix_db):
    rng = np.random.default_rng(hash(mode) % 2**31)
    coll, x = _make_coll(matrix_db, mode, dim, kind, rng)
    q = _gen(kind, 1, dim, rng)[0]
    res = coll.search(q, k=10)
    want = _ref_order(q, x, mode)[:10]
    fn = FNS[MODE_TO_METRIC[mode]]
    got_scores = [fn(q, x[int(i)]) for i in res.ids]
    want_scores = [fn(q, x[int(i)]) for i in want]
    # score-level agreement (ties may reorder equal-score ids only if the
    # engine's tiebreak differs in padding; scores must match exactly-ish)
    np.testing.assert_allclose(got_scores, want_scores, rtol=2e-4, atol=2e-4)
    # returned distances are self-consistent with the metric contract
    np.testing.assert_allclose(res.distances, got_scores, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode,dim,kind", METRIC_CASES)
def test_metric_filtered_search_no_leak(mode, dim, kind, matrix_db):
    rng = np.random.default_rng(hash(mode) % 2**31 + 1)
    coll, x = _make_coll(matrix_db, mode, dim, kind, rng)
    q = _gen(kind, 1, dim, rng)[0]
    res = coll.search(q, k=10, where="bucket = 2")
    assert len(res.ids) > 0
    assert all(int(i) % 4 == 2 for i in res.ids)


@pytest.mark.parametrize("mode,dim,kind", METRIC_CASES)
def test_metric_ordering_direction(mode, dim, kind, matrix_db):
    rng = np.random.default_rng(hash(mode) % 2**31 + 2)
    coll, _ = _make_coll(matrix_db, mode, dim, kind, rng)
    q = _gen(kind, 1, dim, rng)[0]
    d = np.asarray(coll.search(q, k=20).distances)
    if mode == "IP":
        assert np.all(np.diff(d) <= 1e-5)  # descending similarity
    else:
        assert np.all(np.diff(d) >= -1e-5)  # ascending distance


@pytest.mark.parametrize("mode,dim,kind", METRIC_CASES[:8])
def test_metric_k_edge_cases(mode, dim, kind, matrix_db):
    rng = np.random.default_rng(hash(mode) % 2**31 + 3)
    coll, x = _make_coll(matrix_db, mode, dim, kind, rng, n=12)
    q = _gen(kind, 1, dim, rng)[0]
    one = coll.search(q, k=1)
    assert len(one.ids) == 1
    over = coll.search(q, k=50)  # k > n returns all live rows
    assert len(over.ids) == 12


@pytest.mark.parametrize("mode,dim,kind", METRIC_CASES[:6])
def test_metric_batch_equals_loop(mode, dim, kind, matrix_db):
    rng = np.random.default_rng(hash(mode) % 2**31 + 4)
    coll, _ = _make_coll(matrix_db, mode, dim, kind, rng)
    qs = _gen(kind, 5, dim, rng)
    batch = coll.batch_search(qs, k=5)
    for i in range(5):
        single = coll.search(qs[i], k=5)
        np.testing.assert_array_equal(batch[i].ids, single.ids)
        np.testing.assert_allclose(batch[i].distances, single.distances, rtol=1e-5)


@pytest.mark.parametrize("mode,dim,kind", METRIC_CASES[:6])
def test_metric_delete_excluded(mode, dim, kind, matrix_db):
    rng = np.random.default_rng(hash(mode) % 2**31 + 5)
    coll, x = _make_coll(matrix_db, mode, dim, kind, rng, n=50)
    q = x[7]  # the row itself would rank first for distance metrics
    before = coll.search(q, k=50)
    assert 7 in [int(i) for i in before.ids]
    coll.delete([7])
    after = coll.search(q, k=50)
    assert 7 not in [int(i) for i in after.ids]


def test_dimension_contract_haversine(matrix_db):
    with pytest.raises(Exception):
        coll = matrix_db.require_collection("bad_geo", dim=3, drop_if_exists=True)
        coll.add([0], vectors=np.zeros((1, 3), np.float32))
        coll.commit()
        coll.build_index("FLAT-HAVERSINE")
        coll.search(np.zeros(3, np.float32), k=1)


@pytest.mark.parametrize("mode", ["IP", "L2", "COSINE", "L1", "CHEBYSHEV", "CANBERRA"])
def test_approx_agrees_with_exact_top1(mode, matrix_db):
    """Approx-supported metrics (approx_search.rs:177): below the engage
    threshold approx falls back to exact, so results match bit-for-bit."""
    rng = np.random.default_rng(99)
    coll, _ = _make_coll(matrix_db, mode, 16, "normal", rng, n=300)
    q = rng.normal(size=16).astype(np.float32)
    exact = coll.search(q, k=5)
    approx = coll.search(q, k=5, approx=True, eps=1e-4)
    np.testing.assert_array_equal(exact.ids, approx.ids)


class TestReadOnlyContract:
    """Read-only mode contract (reference: engine.rs:1787-1800 — read-only
    refuses mutations; opening is non-destructive)."""

    @pytest.fixture()
    def ro_pair(self, tmp_path, rng):
        root = str(tmp_path / "ro_db")
        client = lynse.VectorDBClient(root)
        db = client.create_database("d")
        coll = db.require_collection("c", dim=8)
        x = rng.normal(size=(30, 8)).astype(np.float32)
        coll.add(list(range(30)), vectors=x, fields=[{"g": i % 3} for i in range(30)])
        coll.commit()
        client.close()
        ro = lynse.VectorDBClient(root, read_only=True)
        yield ro, x
        ro.close()

    def test_read_only_search_and_query_work(self, ro_pair):
        ro, x = ro_pair
        coll = ro.get_database("d").get_collection("c")
        res = coll.search(x[3], k=5)
        assert int(res.ids[0]) == 3
        res_f = coll.search(x[3], k=5, where="g = 0")
        assert all(int(i) % 3 == 0 for i in res_f.ids)

    def test_read_only_mutations_raise(self, ro_pair):
        ro, x = ro_pair
        coll = ro.get_database("d").get_collection("c")
        with pytest.raises(Exception):
            coll.add([100], vectors=x[:1])
        with pytest.raises(Exception):
            coll.delete([1])
        with pytest.raises(Exception):
            coll.upsert([0], vectors=x[:1])

    def test_read_only_database_level_creates_raise(self, ro_pair):
        ro, _ = ro_pair
        with pytest.raises(Exception):
            ro.create_database("new_db")
        db = ro.get_database("d")
        with pytest.raises(Exception):
            db.require_collection("new_coll", dim=4)

    def test_read_only_does_not_disturb_writer_data(self, ro_pair, tmp_path):
        ro, x = ro_pair
        coll = ro.get_database("d").get_collection("c")
        coll.search(x[0], k=3)
        ro.close()
        # reopen writable: all rows still there and mutable
        rw = lynse.VectorDBClient(str(tmp_path / "ro_db"))
        c2 = rw.get_database("d").get_collection("c")
        assert c2.shape[0] == 30
        c2.add([100], vectors=x[:1])
        c2.commit()
        assert c2.shape[0] == 31
        rw.close()
