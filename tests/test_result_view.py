"""ResultView contract tests (reference: tests/standard_tests/
test_result_view.py — container semantics, conversions, index-mode parsing)."""

import json

import numpy as np
import pytest

from lynsedb_tpu.result_view import ResultView, _parse_index_mode


def _rv(n=3, fields=True, vectors=False):
    return ResultView(
        ids=np.arange(1, n + 1, dtype=np.int64),
        distances=np.linspace(0.9, 0.1, n).astype(np.float32),
        fields=[{"i": i} for i in range(n)] if fields else [],
        vectors=np.ones((n, 4), dtype=np.float32) if vectors else None,
        k=n,
        distance="IP",
        index="Flat",
        result_type="search",
    )


def test_container_semantics():
    rv = _rv(fields=False)
    assert len(rv) == 3  # row count
    ids, dists = rv  # iteration yields the present components
    assert list(ids) == [1, 2, 3]
    rv3 = _rv()  # with fields: three components
    ids, dists, fields = rv3
    assert fields[0] == {"i": 0}
    assert rv.k == 3
    assert rv.distance_metric == "IP"
    assert rv.index_type == "Flat"


def test_slicing_narrows_k():
    rv = _rv(5)
    sub = rv[1:3]
    assert sub.k == 2
    assert sub.ids.tolist() == [2, 3]
    assert sub.distance_metric == "IP"


def test_equality():
    assert _rv() == _rv()
    other = ResultView(
        ids=np.array([9, 9, 9], dtype=np.int64),
        distances=np.linspace(0.9, 0.1, 3).astype(np.float32),
        fields=[{"i": i} for i in range(3)],
        k=3, distance="IP", index="Flat", result_type="search",
    )
    assert _rv() != other


def test_to_list_and_dict_and_json():
    rv = _rv()
    lst = rv.to_list()
    assert lst[0] == {"id": 1, "distance": pytest.approx(0.9), "fields": {"i": 0}}
    d = rv.to_dict()
    assert d["ids"] == [1, 2, 3]
    parsed = json.loads(rv.to_json())
    assert parsed["ids"] == [1, 2, 3]


def test_to_numpy():
    rv = _rv()
    arr = rv.to_numpy()
    assert arr.shape[0] == 3


def test_to_pandas_and_arrow():
    pd = pytest.importorskip("pandas")
    rv = _rv()
    df = rv.to_pandas()
    assert list(df["id"]) == [1, 2, 3]
    pytest.importorskip("pyarrow")
    tbl = rv.to_arrow()
    assert tbl.num_rows == 3


def test_to_polars_optional():
    pl = pytest.importorskip("polars")
    assert _rv().to_polars().height == 3


def test_parse_index_mode():
    assert _parse_index_mode("FLAT-IP") == ("Flat", "IP")
    assert _parse_index_mode("IVF-L2-SQ8")[0] == "IVF"
    assert _parse_index_mode(None) == ("Flat", "IP")
