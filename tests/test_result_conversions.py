"""ResultView conversion depth: dataframe/table round trips and edge shapes
(reference: tests/standard_tests/test_result_view.py — 49 tests over
conversions, emptiness, equality, and metadata propagation)."""

import json

import numpy as np
import pytest

import lynsedb_tpu as lynse


@pytest.fixture(scope="module")
def res(tmp_path_factory):
    root = tmp_path_factory.mktemp("rv") / "db"
    client = lynse.VectorDBClient(str(root))
    coll = client.create_database("d").require_collection("c", dim=4)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(30, 4)).astype(np.float32)
    coll.add(list(range(30)), vectors=x, fields=[{"g": i % 3, "name": f"row{i}"} for i in range(30)])
    coll.commit()
    out = coll.search(x[3], k=7, return_fields=True)
    yield out, x
    client.close()


def test_to_list_shape_and_fields(res):
    view, _ = res
    rows = view.to_list()
    assert len(rows) == 7
    assert {"id", "distance"} <= set(rows[0])
    assert rows[0]["fields"]["name"].startswith("row")


def test_to_dict_parallel_arrays(res):
    view, _ = res
    d = view.to_dict()
    assert len(d["ids"]) == len(d["distances"]) == 7
    assert list(d["ids"]) == [int(i) for i in view.ids]


def test_to_json_round_trips(res):
    view, _ = res
    parsed = json.loads(view.to_json())
    assert parsed["ids"] == [int(i) for i in view.ids]


def test_to_numpy_returns_primary_component(res):
    view, _ = res
    # contract: vectors if present, else distances, else ids (reference
    # result_view.py to_numpy semantics)
    arr = view.to_numpy()
    assert arr.dtype == np.float32
    np.testing.assert_array_equal(arr, view.distances)


def test_to_pandas(res):
    pd = pytest.importorskip("pandas")
    view, _ = res
    df = view.to_pandas()
    assert isinstance(df, pd.DataFrame)
    assert len(df) == 7
    assert list(df["id"]) == [int(i) for i in view.ids]


def test_to_arrow(res):
    pa = pytest.importorskip("pyarrow")
    view, _ = res
    table = view.to_arrow()
    assert isinstance(table, pa.Table)
    assert table.num_rows == 7


def test_polars_missing_or_working(res):
    view, _ = res
    try:
        import polars as pl  # noqa: F401
    except ImportError:
        with pytest.raises(Exception):
            view.to_polars()
    else:
        assert len(view.to_polars()) == 7


def test_empty_result_conversions(tmp_path):
    client = lynse.VectorDBClient(str(tmp_path / "e"))
    coll = client.create_database("d").require_collection("c", dim=4)
    coll.add([1], vectors=np.ones((1, 4), np.float32), fields=[{"g": 1}])
    coll.commit()
    empty = coll.search(np.ones(4, np.float32), k=5, where="g = 99")
    assert len(empty) == 0
    assert empty.to_list() == []
    assert empty.to_dict()["ids"] == []
    assert empty.to_numpy().shape == (0,)
    client.close()


def test_query_vectors_view_has_vectors(res):
    view, x = res
    # vectors populated only on vector-returning calls
    assert view.vectors is None or len(view.vectors) == len(view.ids)


def test_slicing_preserves_metadata(res):
    view, _ = res
    part = view[2:5]
    assert len(part) == 3
    assert part.distance_metric == view.distance_metric
    assert part.index_type == view.index_type
    np.testing.assert_array_equal(part.ids, view.ids[2:5])


def test_iteration_unpacks_components(res):
    view, _ = res
    ids, dists, fields = view  # component-wise unpacking (reference semantics)
    np.testing.assert_array_equal(ids, view.ids)
    np.testing.assert_array_equal(dists, view.distances)


def test_equality_and_inequality(res):
    view, x = res
    assert view == view
    assert not (view == view[1:])


def test_repr_contains_metric(res):
    view, _ = res
    assert view.distance_metric in repr(view)
