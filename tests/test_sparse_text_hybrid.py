"""Sparse vectors, BM25 text search, hybrid fusion."""

import numpy as np
import pytest

from lynsedb_tpu.engine.text_index import InvertedTextIndex, tokenize
from lynsedb_tpu.engine.sparse import normalize_sparse_entries


def test_tokenizer():
    assert tokenize("Hello, World! foo_bar x2") == ["hello", "world", "foo", "bar", "x2"]
    assert tokenize("") == []


def test_normalize_sparse_entries():
    assert normalize_sparse_entries({3: 1.0, 1: 2.0}) == [(1, 2.0), (3, 1.0)]
    assert normalize_sparse_entries([(2, 1.0), (2, 1.5), (0, 0.0)]) == [(2, 2.5)]
    with pytest.raises(ValueError):
        normalize_sparse_entries([(-1, 1.0)])


def test_bm25_index_scoring(tmp_path):
    idx = InvertedTextIndex(tmp_path / "t.msgpack")
    idx.upsert_document(0, {"title": "quick brown fox", "body": "jumps over the lazy dog"})
    idx.upsert_document(1, {"title": "lazy dog sleeps", "body": "all day long"})
    idx.upsert_document(2, {"title": "quantum computing", "body": "qubits entanglement"})
    res = idx.search("lazy dog", None, 10)
    ids = [i for i, _ in res]
    assert set(ids) == {0, 1}
    assert ids[0] == 1  # doc 1 mentions both terms in a shorter doc
    res = idx.search("quantum", None, 10)
    assert [i for i, _ in res] == [2]
    # field-restricted search
    res = idx.search("dog", ["title"], 10)
    assert [i for i, _ in res] == [1]


def test_bm25_persistence(tmp_path):
    idx = InvertedTextIndex(tmp_path / "t.msgpack")
    idx.upsert_document(5, {"txt": "alpha beta"})
    idx.save()
    idx2 = InvertedTextIndex(tmp_path / "t.msgpack")
    assert [i for i, _ in idx2.search("alpha", None, 10)] == [5]


@pytest.fixture
def text_collection(db, rng):
    coll = db.require_collection("texts", dim=4, drop_if_exists=True)
    docs = [
        {"title": "vector databases on TPU", "lang": "en"},
        {"title": "cooking pasta carbonara", "lang": "it"},
        {"title": "TPU systolic arrays and matmuls", "lang": "en"},
        {"title": "gardening in spring", "lang": "en"},
    ]
    coll.add([1, 2, 3, 4], vectors=rng.normal(size=(4, 4)).astype(np.float32), fields=docs)
    coll.commit()
    return coll


def test_collection_bm25_search(text_collection):
    res = text_collection.bm25_search("TPU matmuls", k=10, return_fields=True)
    assert res.ids.tolist()[0] == 3
    assert set(res.ids.tolist()) == {1, 3}
    assert res.index_type == "BM25-INVERTED"
    # where-filtered
    res = text_collection.bm25_search("TPU", k=10, where="lang = 'en'")
    assert set(res.ids.tolist()) == {1, 3}


def test_bm25_respects_deletes(text_collection):
    text_collection.delete([3])
    res = text_collection.bm25_search("TPU", k=10)
    assert res.ids.tolist() == [1]


def test_bm25_sees_new_rows_after_materialization(text_collection, rng):
    text_collection.bm25_search("TPU", k=1)  # materialize index
    text_collection.add([9], vectors=rng.normal(size=(1, 4)).astype(np.float32),
                        fields=[{"title": "TPU pallas kernels"}])
    res = text_collection.bm25_search("pallas", k=10)
    assert res.ids.tolist() == [9]


def test_sparse_search(db, rng):
    coll = db.require_collection("sparse", dim=4, drop_if_exists=True)
    coll.add([10, 20, 30], vectors=rng.normal(size=(3, 4)).astype(np.float32),
             fields=[{"g": 1}, {"g": 2}, {"g": 1}])
    coll.add_sparse_vectors(
        [{1: 1.0, 5: 2.0}, {1: 0.5}, {5: 3.0, 9: 1.0}],
        [10, 20, 30],
    )
    coll.commit()
    res = coll.search_sparse({1: 1.0, 5: 1.0}, k=3)
    assert res.ids.tolist() == [10, 30, 20]
    np.testing.assert_allclose(res.distances, [3.0, 3.0, 0.5])
    # filtered
    res = coll.search_sparse({1: 1.0, 5: 1.0}, k=3, where="g = 1")
    assert res.ids.tolist() == [10, 30]
    # deletes respected
    coll.delete([10])
    res = coll.search_sparse({1: 1.0, 5: 1.0}, k=3)
    assert 10 not in res.ids.tolist()


def test_sparse_persistence(db, rng, tmp_root):
    coll = db.require_collection("sparse_p", dim=4, drop_if_exists=True)
    coll.add([1], vectors=rng.normal(size=(1, 4)).astype(np.float32))
    coll.add_sparse_vectors([{2: 1.5}], [1])
    coll.commit()
    from lynsedb_tpu.engine.collection import Collection

    eng = Collection(coll._engine.root, "sparse_p")
    res = eng.search_sparse({2: 1.0}, k=1)
    assert res.ids.tolist() == [0]  # internal id
    eng.close()


def test_hybrid_search_rrf(text_collection, rng):
    q = rng.normal(size=(4,)).astype(np.float32)
    res = text_collection.hybrid_search(vector=q, text="TPU", k=4)
    assert res.index_type == "HYBRID-RRF"
    assert len(res.ids) >= 2
    # text-only and vector-only hybrid still work
    res_t = text_collection.hybrid_search(text="TPU", k=4)
    assert set(res_t.ids.tolist()) == {1, 3}
    res_v = text_collection.hybrid_search(vector=q, k=2)
    assert len(res_v.ids) == 2
    with pytest.raises(Exception):
        text_collection.hybrid_search(k=3)


def test_hybrid_weighted(text_collection, rng):
    q = rng.normal(size=(4,)).astype(np.float32)
    res = text_collection.hybrid_search(
        vector=q, text="TPU", k=4, fusion="weighted", vector_weight=0.0, text_weight=1.0
    )
    assert res.index_type == "HYBRID-WEIGHTED"
    # with zero vector weight the best text match wins (min-max score
    # normalization maps the weakest match to 0, like the reference)
    assert res.ids.tolist()[0] == 1
    assert res.distances[0] == 1.0


def test_hybrid_search_stream_matches_sequential(tmp_path, rng):
    import lynsedb_tpu as lynse

    client = lynse.VectorDBClient(str(tmp_path / "hybs"))
    db = client.create_database("d")
    coll = db.require_collection("c", dim=12)
    v = rng.normal(size=(300, 12)).astype(np.float32)
    words = ["alpha", "beta", "gamma", "delta"]
    coll.add(list(range(300)), vectors=v,
             fields=[{"t": f"{words[i % 4]} doc{i}"} for i in range(300)])
    coll.commit()

    qs = v[:8] + rng.normal(0, 0.01, size=(8, 12)).astype(np.float32)
    texts = [words[i % 4] for i in range(8)]
    stream = coll.hybrid_search_stream(qs, texts, k=5)
    for i in range(8):
        seq = coll.hybrid_search(qs[i], texts[i], k=5)
        assert [int(x) for x in stream[i].ids] == [int(x) for x in seq.ids]
        np.testing.assert_allclose(stream[i].distances, seq.distances, rtol=1e-6)
    # text-only and vector-only streams also work
    t_only = coll.hybrid_search_stream(None, texts, k=5)
    assert len(t_only) == 8 and all(len(r.ids) > 0 for r in t_only)
    v_only = coll.hybrid_search_stream(qs, None, k=5)
    assert len(v_only) == 8 and all(len(r.ids) == 5 for r in v_only)
    client.close()


def test_hybrid_search_stream_single_1d_vector(tmp_path, rng):
    """A single 1-D query must count as ONE query, not dim queries
    (regression: n_q was computed before np.atleast_2d)."""
    import lynsedb_tpu as lynse

    client = lynse.VectorDBClient(str(tmp_path / "hyb1"))
    db = client.create_database("d")
    coll = db.require_collection("c", dim=12)
    v = rng.normal(size=(100, 12)).astype(np.float32)
    coll.add(list(range(100)), vectors=v,
             fields=[{"t": f"alpha doc{i}"} for i in range(100)])
    coll.commit()
    out = coll.hybrid_search_stream(v[7], ["alpha"], k=5)
    assert len(out) == 1
    seq = coll.hybrid_search(v[7], "alpha", k=5)
    assert out[0].ids.tolist() == seq.ids.tolist()
