"""Search edge contracts: empty/deleted corpora, approx parameter
validation, metric × index gating, index lifecycle (remove/rebuild/compact).

Mirrors reference behaviors from tests/standard_tests/test_search.py
(approx eps contract, exact-only-metric gating, post-lifecycle search
correctness)."""

import numpy as np
import pytest

from lynsedb_tpu.engine.errors import InvalidArgument


@pytest.fixture
def coll(db, rng):
    coll = db.require_collection("sedge", dim=4, drop_if_exists=True)
    coll.add(
        list(range(8)),
        vectors=rng.normal(size=(8, 4)).astype(np.float32),
        fields=[{"i": i} for i in range(8)],
    )
    coll.commit()
    return coll


def test_search_on_empty_collection_returns_empty(db):
    empty = db.require_collection("sedge_empty", dim=4, drop_if_exists=True)
    res = empty.search(np.ones(4, dtype=np.float32), k=3)
    assert list(res.ids) == []


def test_search_all_deleted_returns_empty(coll):
    coll.delete(list(range(8)))
    assert list(coll.search(np.ones(4, dtype=np.float32), k=5).ids) == []


@pytest.mark.parametrize("eps", [float("nan"), float("inf"), float("-inf")])
def test_approx_search_rejects_non_finite_eps(coll, eps):
    with pytest.raises(InvalidArgument):
        coll.search(np.ones(4, dtype=np.float32), k=1, approx=True, eps=eps)


def test_binary_metrics_reject_graph_indexes(db, rng):
    coll = db.require_collection("sedge_bin", dim=8, drop_if_exists=True)
    coll.add([1, 2, 3], vectors=(rng.random((3, 8)) > 0.5).astype(np.float32))
    coll.commit()
    with pytest.raises(InvalidArgument):
        coll.build_index("HNSW-HAMMING")
    with pytest.raises(InvalidArgument):
        coll.build_index("DISKANN-JACCARD")


def test_binary_metrics_reject_quantized_combos(db, rng):
    coll = db.require_collection("sedge_binq", dim=8, drop_if_exists=True)
    coll.add([1, 2, 3], vectors=(rng.random((3, 8)) > 0.5).astype(np.float32))
    coll.commit()
    with pytest.raises(InvalidArgument):
        coll.build_index("FLAT-HAMMING-PQ")


def test_haversine_rejects_wrong_dimension(db, rng):
    coll = db.require_collection("sedge_hav", dim=4, drop_if_exists=True)
    coll.add([1], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    coll.commit()
    with pytest.raises(InvalidArgument):
        coll.build_index("FLAT-HAVERSINE")


def test_search_after_remove_index_falls_back_to_flat(coll, rng):
    coll.build_index("IVF-IP", n_clusters=2)
    coll.remove_index()
    q = rng.normal(size=4).astype(np.float32)
    res = coll.search(q, k=3)
    assert len(res.ids) == 3
    prof = coll.search_profile(q, k=3)
    assert "flat" in prof["index_path"].lower()


def test_rebuild_index_after_insert_covers_new_rows(coll, rng):
    coll.build_index("IVF-IP", n_clusters=2)
    new_vec = rng.normal(size=4).astype(np.float32)
    coll.add([100], vectors=new_vec.reshape(1, -1))
    coll.commit()
    coll.build_index("IVF-IP", n_clusters=2)
    res = coll.search(new_vec, k=8, nprobe=2)
    assert 100 in res.ids.tolist()


def test_search_after_compact_still_correct(coll, rng):
    coll.delete([0, 1, 2])
    coll.commit()
    coll.compact()
    res = coll.search(rng.normal(size=4).astype(np.float32), k=8)
    assert set(res.ids.tolist()) <= {3, 4, 5, 6, 7}


def test_search_range_max_results_zero(coll):
    res = coll.search_range(np.ones(4, dtype=np.float32), threshold=1e9, max_results=0)
    assert list(res.ids) == []


def test_search_range_after_compact(coll):
    # default metric is IP: a similarity floor of -1e9 admits every live row
    coll.delete([5, 6, 7])
    coll.commit()
    coll.compact()
    res = coll.search_range(np.ones(4, dtype=np.float32), threshold=-1e9)
    assert set(res.ids.tolist()) == {0, 1, 2, 3, 4}


def test_query_vectors_empty_filter_ids_returns_empty(coll):
    res = coll.query_vectors(filter_ids=[])
    assert len(res.ids) == 0
    assert res.vectors.shape[0] == 0


def test_query_vectors_rows_match_fields(coll):
    res = coll.query_vectors(where='"i" >= 6')
    assert res.vectors.shape == (2, 4)
    assert [f["i"] for f in res.fields] == [6, 7]


def test_batch_search_with_where_respects_filter(coll, rng):
    qs = rng.normal(size=(3, 4)).astype(np.float32)
    views = coll.batch_search(qs, k=8, where='"i" < 4')
    assert len(views) == 3
    for view in views:
        assert set(view.ids.tolist()) <= {0, 1, 2, 3}


def test_batch_search_different_queries_differ(coll, rng):
    qs = np.stack([np.ones(4), -np.ones(4)]).astype(np.float32)
    views = coll.batch_search(qs, k=3)
    assert views[0].ids.tolist() != views[1].ids.tolist() or (
        views[0].distances.tolist() != views[1].distances.tolist()
    )


def test_approx_refills_after_deleting_top_result(coll, rng):
    q = rng.normal(size=4).astype(np.float32)
    top = coll.search(q, k=1).ids.tolist()[0]
    coll.delete([int(top)])
    res = coll.search(q, k=3, approx=True)
    assert top not in res.ids.tolist()
    assert len(res.ids) == 3
