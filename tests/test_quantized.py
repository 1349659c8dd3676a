"""Quantized index tests: SQ8 / PQ / RaBitQ / PolarVec recall floors mirror
the reference gate floors (gate_index_modes.py:259-273: SQ8 0.95,
PQ/RaBitQ/PolarVec 0.70)."""

import numpy as np
import pytest

from lynsedb_tpu.ops import quantize as Q


def _recall(got_ids, want_ids):
    got = set(int(i) for i in np.asarray(got_ids).ravel() if i >= 0)
    want = set(int(i) for i in want_ids)
    return len(got & want) / max(len(want), 1)


def test_fwht_orthonormal(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32)
    import jax.numpy as jnp

    y = np.asarray(Q.fwht(jnp.asarray(x)))
    # orthonormal: norms preserved
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=1), np.linalg.norm(x, axis=1), rtol=1e-5
    )
    # involution up to normalization
    z = np.asarray(Q.fwht(jnp.asarray(y)))
    np.testing.assert_allclose(z, x, atol=1e-5)


def test_sq8_codec_roundtrip(rng):
    data = rng.normal(size=(100, 32)).astype(np.float32)
    sq = Q.SQ8.fit(data)
    codes = sq.encode(data)
    assert codes.dtype == np.int8
    decoded = sq.decode(codes)
    err = np.abs(decoded - data).max()
    spread = (data.max(0) - data.min(0)).max()
    assert err <= spread / 255.0 * 0.51 + 1e-6


def test_pq_subspace_parse():
    assert Q.parse_n_subspaces(128, None) == 16
    assert Q.parse_n_subspaces(100, 16) == 10
    assert Q.parse_n_subspaces(7, 16) == 7


@pytest.fixture(scope="module")
def quant_data():
    rng = np.random.default_rng(11)
    n, d = 4000, 64
    data = rng.normal(size=(n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.normal(size=(8, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    want = np.argsort(-(queries @ data.T), axis=1)[:, :10]
    return data, queries, want


@pytest.mark.parametrize(
    "mode,floor",
    [
        ("FLAT-IP-SQ8", 0.95),
        ("FLAT-IP-PQ", 0.70),
        ("FLAT-IP-RABITQ", 0.70),
        ("FLAT-IP-POLARVEC", 0.70),
    ],
)
def test_quantized_recall_floor(db, quant_data, mode, floor):
    data, queries, want = quant_data
    name = "q_" + mode.replace("-", "_").lower()
    coll = db.require_collection(name, dim=64, drop_if_exists=True, default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index(mode)
    total = 0.0
    for i in range(len(queries)):
        res = coll.search(queries[i], k=10)
        total += _recall(res.ids, want[i])
    assert total / len(queries) >= floor, f"{mode} recall {total/len(queries):.3f} < {floor}"


def test_sq8_l2_mode(db, quant_data):
    data, queries, _ = quant_data
    coll = db.require_collection("q_l2_sq8", dim=64, drop_if_exists=True, default_index=None)
    coll.add(list(range(len(data))), vectors=data)
    coll.commit()
    coll.build_index("FLAT-L2-SQ8")
    want = np.argsort(((data - queries[0]) ** 2).sum(-1))[:10]
    res = coll.search(queries[0], k=10)
    assert _recall(res.ids, want) >= 0.9
    assert all(np.diff(res.distances) >= -1e-6)


def test_quantized_filtered_search_no_leaks(db, quant_data):
    data, queries, _ = quant_data
    coll = db.require_collection("q_filt", dim=64, drop_if_exists=True, default_index=None)
    fields = [{"bucket": i % 4} for i in range(len(data))]
    coll.add(list(range(len(data))), vectors=data, fields=fields)
    coll.commit()
    coll.build_index("FLAT-IP-PQ")
    res = coll.search(queries[0], k=50, where="bucket = 2", return_fields=True)
    assert len(res.ids) > 0
    assert all(i % 4 == 2 for i in res.ids.tolist())


def test_quantized_tail_rows_visible(db, quant_data):
    data, queries, _ = quant_data
    coll = db.require_collection("q_tail", dim=64, drop_if_exists=True, default_index=None)
    coll.add(list(range(1000)), vectors=data[:1000])
    coll.commit()
    coll.build_index("FLAT-IP-SQ8")
    # new rows after build, committed -> incrementally encoded
    coll.add([5000], vectors=data[1500:1501] * 3.0)
    coll.commit()
    res = coll.search(data[1500] * 3.0, k=1)
    assert res.ids[0] == 5000


def test_quantized_index_persists(db, quant_data, tmp_path):
    data, queries, _ = quant_data
    coll = db.require_collection("q_persist", dim=64, drop_if_exists=True, default_index=None)
    coll.add(list(range(500)), vectors=data[:500])
    coll.commit()
    coll.build_index("FLAT-IP-RABITQ")
    from lynsedb_tpu.engine.collection import Collection

    eng = Collection(coll._engine.root, "q_persist")
    assert eng._aux_index is not None
    assert eng._aux_index.kind == "rabitq"
    d, i = eng._aux_index.search(eng, queries[:1], 5)
    assert i.shape[1] == 5
    eng.close()
