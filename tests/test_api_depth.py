"""Depth coverage for the thinner client-API surfaces.

Mirrors reference standard-test breadth (reference:
tests/standard_tests/test_collection.py — sessions/durability/blobs,
test_search.py — rerankers/profile/range, test_database.py —
snapshot/export round trips) for surfaces the earlier suites touch only
once: named vector fields, insert sessions, rerank output forms,
search_range, blobs, search_profile, query/head/tail, snapshot/restore and
export/import round trips.
"""

import numpy as np
import pytest

import lynsedb_tpu as lynse


@pytest.fixture()
def coll100(db, rng):
    coll = db.require_collection("depth", dim=8, drop_if_exists=True)
    x = rng.normal(size=(100, 8)).astype(np.float32)
    coll.add(list(range(100)), vectors=x,
             fields=[{"g": i % 5, "name": f"row{i}"} for i in range(100)])
    coll.commit()
    return coll, x


# ── named vector fields (reference: engine.rs:4042-4388) ─────────────────


class TestNamedVectorFields:
    def test_multimodal_fields_are_independent(self, db, rng):
        coll = db.require_collection("mm", dim=8, drop_if_exists=True)
        base = rng.normal(size=(20, 8)).astype(np.float32)
        coll.add(list(range(20)), vectors=base)
        coll.create_vector_field("image", dim=16, metric="l2")
        img = rng.normal(size=(20, 16)).astype(np.float32)
        coll.add_named_vectors("image", list(range(20)), img)
        coll.commit()
        assert "image" in coll.list_vector_fields()
        # search the named field: nearest in image space, not default space
        res = coll.search(img[7], k=3, vector_field="image")
        assert int(res.ids[0]) == 7
        # default field unaffected
        res_d = coll.search(base[11], k=3)
        assert int(res_d.ids[0]) == 11

    def test_named_field_dim_mismatch_raises(self, db, rng):
        coll = db.require_collection("mm2", dim=8, drop_if_exists=True)
        coll.add([0], vectors=rng.normal(size=(1, 8)).astype(np.float32))
        coll.create_vector_field("aud", dim=4, metric="ip")
        with pytest.raises(Exception):
            coll.add_named_vectors("aud", [0], rng.normal(size=(1, 6)).astype(np.float32))

    def test_named_field_index_build_and_remove(self, db, rng):
        coll = db.require_collection("mm3", dim=8, drop_if_exists=True)
        x = rng.normal(size=(300, 8)).astype(np.float32)
        coll.add(list(range(300)), vectors=x)
        coll.create_vector_field("img", dim=8, metric="l2")
        coll.add_named_vectors("img", list(range(300)), x)
        coll.commit()
        coll.build_vector_field_index("img", "IVF-L2", n_clusters=8)
        res = coll.search(x[5], k=3, vector_field="img", nprobe=8)
        assert int(res.ids[0]) == 5
        coll.remove_index("img")
        res = coll.search(x[5], k=3, vector_field="img")
        assert int(res.ids[0]) == 5

    def test_named_field_survives_reopen(self, tmp_path, rng):
        root = str(tmp_path / "nv")
        client = lynse.VectorDBClient(root)
        db = client.create_database("d")
        coll = db.require_collection("c", dim=8)
        x = rng.normal(size=(10, 8)).astype(np.float32)
        y = rng.normal(size=(10, 4)).astype(np.float32)
        coll.add(list(range(10)), vectors=x)
        coll.create_vector_field("alt", dim=4, metric="l2")
        coll.add_named_vectors("alt", list(range(10)), y)
        coll.commit()
        client.close()
        re = lynse.VectorDBClient(root)
        c2 = re.get_database("d").get_collection("c")
        assert "alt" in c2.list_vector_fields()
        res = c2.search(y[3], k=2, vector_field="alt")
        assert int(res.ids[0]) == 3
        re.close()


# ── insert sessions (reference: execution_layer/session.py) ──────────────


class TestInsertSession:
    def test_session_batches_and_commits(self, db, rng):
        coll = db.require_collection("sess", dim=8, drop_if_exists=True)
        x = rng.normal(size=(250, 8)).astype(np.float32)
        with coll.insert_session(batch_size=100) as s:
            for lo in range(0, 250, 50):
                s.add(list(range(lo, lo + 50)), vectors=x[lo : lo + 50])
        assert coll.shape[0] == 250
        # session commits on exit
        assert coll.COMMIT_FLAG

    def test_session_rolls_back_unflushed_on_exception(self, db, rng):
        coll = db.require_collection("sess2", dim=8, drop_if_exists=True)
        x = rng.normal(size=(30, 8)).astype(np.float32)
        coll.add(list(range(100, 130)), vectors=x)
        coll.commit()
        with pytest.raises(RuntimeError):
            with coll.insert_session(batch_size=10_000) as s:
                s.add(list(range(30)), vectors=x)  # stays buffered
                raise RuntimeError("boom")
        # buffered rows discarded; pre-existing rows intact
        assert coll.shape[0] == 30
        assert coll.is_id_exists(100)
        assert not coll.is_id_exists(5)

    def test_session_auto_ids_do_not_mix_with_explicit(self, db, rng):
        coll = db.require_collection("sess3", dim=8, drop_if_exists=True)
        with pytest.raises(ValueError):
            with coll.insert_session() as s:
                s.add(vectors=rng.normal(size=(2, 8)).astype(np.float32))
                s.add([7], vectors=rng.normal(size=(1, 8)).astype(np.float32))
                s.flush()


# ── rerank output forms (reference: api/rerank.py:19) ────────────────────


class TestRerank:
    def _q(self, x):
        return x[3] + 0.01

    def test_reranker_id_list(self, coll100):
        coll, x = coll100
        res = coll.search(self._q(x), k=10,
                          reranker=lambda p: [it["id"] for it in reversed(p["items"])])
        base = coll.search(self._q(x), k=10)
        assert [int(i) for i in res.ids] == [int(i) for i in reversed(base.ids)]

    def test_reranker_pairs_and_rerank_k(self, coll100):
        coll, x = coll100
        res = coll.search(self._q(x), k=10, rerank_k=3,
                          reranker=lambda p: [(it["id"], 1.0) for it in p["items"]])
        assert len(res.ids) == 3

    def test_reranker_scores_array(self, coll100):
        coll, x = coll100
        res = coll.search(self._q(x), k=5,
                          reranker=lambda p: np.linspace(0, 1, len(p["items"])))
        base = coll.search(self._q(x), k=5)
        # scores ascending by position -> reversed order wins
        assert int(res.ids[0]) == int(base.ids[-1])

    def test_reranker_sees_fields_when_requested(self, coll100):
        coll, x = coll100
        seen = {}

        def rr(payload):
            seen["fields"] = [it["field"] for it in payload["items"]]
            return [it["id"] for it in payload["items"]]

        coll.search(self._q(x), k=4, reranker=rr, rerank_with_fields=True)
        assert all(f and "name" in f for f in seen["fields"])

    def test_non_callable_reranker_raises(self, coll100):
        coll, x = coll100
        with pytest.raises(TypeError):
            coll.search(self._q(x), k=3, reranker="not-a-fn")


# ── search_range (reference: engine.rs:6410) ─────────────────────────────


class TestSearchRange:
    def test_range_returns_only_within_threshold(self, coll100):
        coll, x = coll100
        coll.build_index("FLAT-L2")
        q = x[0]
        d2 = ((x - q) ** 2).sum(1)
        thr = float(np.sort(d2)[10])  # 11 rows within (incl. self)
        res = coll.search_range(q, thr)
        assert set(int(i) for i in res.ids) == set(np.nonzero(d2 <= thr)[0].tolist())
        assert (np.asarray(res.distances) <= thr + 1e-5).all()

    def test_range_respects_max_results_and_where(self, coll100):
        coll, x = coll100
        coll.build_index("FLAT-L2")
        res = coll.search_range(x[0], 1e9, max_results=7)
        assert len(res.ids) == 7
        resw = coll.search_range(x[0], 1e9, where="g = 2")
        assert all(int(i) % 5 == 2 for i in resw.ids)


# ── blobs (reference: engine.rs:6296-6331) ───────────────────────────────


class TestBlobs:
    def test_blob_roundtrip_range_delete(self, coll100):
        coll, _ = coll100
        payload = bytes(range(256)) * 4
        coll.write_blob("model.bin", payload)
        assert coll.read_blob("model.bin") == payload
        assert coll.read_blob_range("model.bin", 256, 16) == payload[256:272]
        assert coll.delete_blob("model.bin") is True
        assert coll.read_blob("model.bin") is None
        assert coll.delete_blob("model.bin") is False

    def test_blob_overwrite(self, coll100):
        coll, _ = coll100
        coll.write_blob("k", b"one")
        coll.write_blob("k", b"two-longer")
        assert coll.read_blob("k") == b"two-longer"


# ── search_profile (reference: engine.rs:6906 QueryProfile) ──────────────


def test_search_profile_reports_plan_and_timings(coll100):
    coll, x = coll100
    prof = coll.search_profile(x[0], k=5)
    for key in ("index_path", "filter_matches", "scanned_vectors",
                "search_us", "total_us"):
        assert key in prof, prof
    assert prof["scanned_vectors"] > 0
    filtered = coll.search_profile(x[0], k=5, where="g = 1")
    assert filtered["filter_matches"] == 20
    rr = coll.search_profile(x[0], k=5, reranker=lambda p: [i["id"] for i in p["items"]])
    assert rr["rerank_us"] >= 0 and rr["total_us"] >= rr["rerank_us"]


# ── query/head/tail/query_vectors ────────────────────────────────────────


class TestDataQueries:
    def test_query_where_and_ids_only(self, coll100):
        coll, _ = coll100
        rv = coll.query(where="g = 3")
        assert sorted(int(i) for i in rv.ids) == list(range(3, 100, 5))
        ids_only = coll.query(where="g = 3", return_ids_only=True)
        assert sorted(int(i) for i in ids_only) == list(range(3, 100, 5))

    def test_query_vectors_returns_exact_rows(self, coll100):
        coll, x = coll100
        rv = coll.query_vectors(where="g = 0")
        got = {int(i): v for i, v in zip(rv.ids, np.asarray(rv.vectors))}
        for i in range(0, 100, 5):
            np.testing.assert_allclose(got[i], x[i], rtol=1e-6)

    def test_head_tail_order(self, coll100):
        coll, x = coll100
        h = coll.head(3)
        t = coll.tail(3)
        assert [int(i) for i in h.ids] == [0, 1, 2]
        assert [int(i) for i in t.ids] == [97, 98, 99]
        np.testing.assert_allclose(np.asarray(h.vectors)[0], x[0], rtol=1e-6)


# ── snapshot / export round trips (reference: engine.rs:6847/6608) ───────


class TestSnapshotExport:
    def test_snapshot_restore_roundtrip(self, client, db, coll100, tmp_path):
        coll, x = coll100
        coll.build_index("FLAT-L2")
        snap = tmp_path / "snap"
        db.snapshot_collection("depth", snap)
        restored = db.restore_collection(snap, "depth_restored")
        assert restored.shape[0] == 100
        res = restored.search(x[9], k=1)
        assert int(res.ids[0]) == 9
        # fields came along
        rv = restored.query(where="g = 1")
        assert len(rv.ids) == 20

    def test_export_import_roundtrip(self, db, coll100, tmp_path):
        coll, x = coll100
        exp = tmp_path / "exp"
        db.export_collection("depth", exp)
        imported = db.import_collection(exp, "depth_imported")
        assert imported.shape[0] == 100
        # exact content round trip: vectors, ids, and fields all survive
        rv = imported.query_vectors(where="g = 4")
        got = {int(i): v for i, v in zip(rv.ids, np.asarray(rv.vectors))}
        assert sorted(got) == list(range(4, 100, 5))
        for i in range(4, 100, 5):
            np.testing.assert_allclose(got[i], x[i], rtol=1e-6)
        # search serves under the exported index mode
        res = imported.search(x[4], k=10)
        assert len(res.ids) == 10

    def test_snapshot_is_immutable_copy(self, db, coll100, tmp_path):
        coll, x = coll100
        snap = tmp_path / "snap2"
        db.snapshot_collection("depth", snap)
        coll.delete([0, 1, 2])
        coll.commit()
        restored = db.restore_collection(snap, "depth_frozen")
        assert restored.shape[0] == 100  # snapshot predates the deletes
