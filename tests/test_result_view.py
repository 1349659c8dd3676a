"""ResultView contract tests (reference: tests/standard_tests/
test_result_view.py — dtypes, fixed component tuples, string-key access,
container semantics, conversions, index-mode parsing)."""

import json

import numpy as np
import pytest

from lynsedb_tpu.result_view import ResultView, _parse_index_mode


def _search(n=3, fields=False, k=None):
    return ResultView(
        ids=np.arange(1, n + 1, dtype=np.int64),
        distances=np.linspace(0.9, 0.1, n).astype(np.float32),
        fields=[{"i": i} for i in range(n)] if fields else [],
        k=n if k is None else k,
        distance="IP",
        index="Flat",
        result_type="search",
    )


def _data(n=3, fields=False):
    return ResultView(
        ids=np.arange(1, n + 1, dtype=np.int64),
        vectors=np.ones((n, 4), dtype=np.float32),
        fields=[{"i": i} for i in range(n)] if fields else [],
        result_type="data",
    )


def _query(n=3, fields=True):
    return ResultView(
        ids=np.arange(1, n + 1, dtype=np.int64),
        fields=[{"i": i} for i in range(n)] if fields else [],
        result_type="query",
    )


# ── dtypes and presence ─────────────────────────────────────────────────


def test_ids_dtype():
    assert _search().ids.dtype == np.int64


def test_distances_dtype():
    assert _search().distances.dtype == np.float32


def test_fields_list():
    rv = _search(fields=True)
    assert isinstance(rv.fields, list)
    assert rv.fields[0] == {"i": 0}


def test_fields_empty_when_not_provided():
    assert _search().fields == []


def test_vectors_in_data_result():
    assert _data().vectors.shape == (3, 4)


def test_vectors_none_in_search_result():
    assert _search().vectors is None


def test_distances_none_in_data_result():
    assert _data().distances is None


# ── attributes ──────────────────────────────────────────────────────────


def test_result_type_search():
    assert _search().result_type == "search"


def test_result_type_data():
    assert _data().result_type == "data"


def test_result_type_query():
    assert _query().result_type == "query"


def test_k_attribute():
    assert _search(5).k == 5


def test_distance_metric():
    assert _search().distance_metric == "IP"


def test_index_type():
    assert _search().index_type == "Flat"


# ── container protocol ──────────────────────────────────────────────────


def test_len():
    assert len(_search(4)) == 4


def test_len_empty():
    assert len(ResultView(result_type="search")) == 0


def test_bool_truthy():
    assert bool(_search(1)) is True


def test_bool_falsy():
    assert bool(ResultView(result_type="search")) is False


def test_getitem_string_ids():
    assert len(_search(5)["ids"]) == 5


def test_getitem_string_distances():
    rv = _search(5)
    assert rv["distances"] is rv.distances
    assert rv["distance"] is rv.distances  # singular alias


def test_getitem_string_fields():
    assert isinstance(_search(5, fields=True)["fields"], list)


def test_getitem_string_k():
    assert _search(5)["k"] == 5


def test_getitem_string_measure():
    assert _search()["measure"] == "IP"


def test_getitem_string_index_and_n():
    rv = _data(4)
    assert rv["n"] == 4
    assert _search()["index"] == "Flat"


def test_getitem_invalid_type_raises():
    with pytest.raises(TypeError):
        _ = _search()[0]


def test_getitem_unknown_key_raises():
    with pytest.raises(KeyError):
        _ = _search()["nonexistent"]


def test_iter_search_yields_3_components():
    # search results always unpack as (ids, distances, fields), even when
    # no fields were requested (reference: result_view.py:134)
    assert len(list(_search(4))) == 3


def test_tuple_unpack_search():
    ids, dists, fields = _search(3)
    assert list(ids) == [1, 2, 3]
    assert fields == []


def test_tuple_unpack_data():
    vecs, ids, fields = _data(3)
    assert vecs.shape == (3, 4)
    assert list(ids) == [1, 2, 3]


def test_query_components():
    assert len(list(_query(3, fields=True))) == 2
    assert len(list(_query(3, fields=False))) == 1


# ── equality / repr / slicing ───────────────────────────────────────────


def test_equality_same():
    assert _search(fields=True) == _search(fields=True)


def test_equality_different():
    other = ResultView(
        ids=np.array([9, 9, 9], dtype=np.int64),
        distances=np.linspace(0.9, 0.1, 3).astype(np.float32),
        k=3, distance="IP", index="Flat", result_type="search",
    )
    assert _search() != other


def test_equality_result_type_mismatch():
    a = ResultView(ids=np.arange(3, dtype=np.int64), result_type="query")
    b = ResultView(ids=np.arange(3, dtype=np.int64), result_type="data")
    assert a != b


def test_repr():
    r = repr(_search())
    assert isinstance(r, str) and len(r) > 0


def test_slicing_narrows_k():
    sub = _search(5)[1:3]
    assert sub.k == 2
    assert sub.ids.tolist() == [2, 3]
    assert sub.distance_metric == "IP"


# ── conversions ─────────────────────────────────────────────────────────


def test_to_list_and_dict_and_json():
    rv = _search(fields=True)
    lst = rv.to_list()
    assert lst[0] == {"id": 1, "distance": pytest.approx(0.9), "fields": {"i": 0}}
    d = rv.to_dict()
    assert d["ids"] == [1, 2, 3]
    parsed = json.loads(rv.to_json())
    assert parsed["ids"] == [1, 2, 3]


def test_to_dict_data_result():
    d = _data().to_dict()
    assert d["vectors"][0] == [1.0, 1.0, 1.0, 1.0]
    assert "distances" not in d


def test_to_list_query_result():
    lst = _query().to_list()
    assert lst[0] == {"id": 1, "fields": {"i": 0}}


def test_to_numpy_ids():
    arr = ResultView(ids=np.arange(3, dtype=np.int64), result_type="query").to_numpy()
    assert arr.tolist() == [0, 1, 2]


def test_to_numpy():
    assert _data().to_numpy().shape == (3, 4)


def test_to_pandas_and_arrow():
    pd = pytest.importorskip("pandas")
    rv = _search(fields=True)
    df = rv.to_pandas()
    assert list(df["id"]) == [1, 2, 3]
    pytest.importorskip("pyarrow")
    tbl = rv.to_arrow()
    assert tbl.num_rows == 3


def test_to_polars_optional():
    pl = pytest.importorskip("polars")
    assert _search(fields=True).to_polars().height == 3


# ── index-mode parsing ──────────────────────────────────────────────────


def test_parse_index_mode():
    assert _parse_index_mode("FLAT-IP") == ("Flat", "IP")
    assert _parse_index_mode("FLAT-L2") == ("Flat", "L2")
    assert _parse_index_mode("FLAT-COS")[1] == "Cosine"
    assert _parse_index_mode("IVF-L2-SQ8")[0] == "IVF"
    assert _parse_index_mode("HNSW-IP")[0] == "HNSW"
    assert _parse_index_mode("SPANN-L2")[0] == "SPANN"
    assert _parse_index_mode("DISKANN-IP")[0] == "DiskANN"
    assert _parse_index_mode(None) == ("Flat", "IP")


def test_parse_returns_tuple():
    result = _parse_index_mode("FLAT-L2")
    assert isinstance(result, tuple) and len(result) == 2


def test_domain_metric_names():
    expected = {
        "FLAT-L1": "L1",
        "HNSW-HAVERSINE": "Haversine",
        "FLAT-PEARSON": "Correlation",
        "FLAT-HELLINGER": "Hellinger",
        "FLAT-WASSERSTEIN": "Wasserstein-1D",
        "HNSW-JENSEN-SHANNON": "Jensen-Shannon",
        "FLAT-CHEBYSHEV": "Chebyshev",
        "FLAT-CANBERRA": "Canberra",
        "FLAT-BRAY-CURTIS": "Bray-Curtis",
        "FLAT-TANIMOTO-BINARY": "Tanimoto",
        "FLAT-DICE-BINARY": "Dice",
    }
    for mode, metric in expected.items():
        assert _parse_index_mode(mode)[1] == metric
