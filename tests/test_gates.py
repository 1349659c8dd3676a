"""Recall-floor release gates as pytest (reference: gate_index_modes.py
:259-273 floors, treated as a release check — excluded from the default run;
invoke with `pytest -m gates tests/test_gates.py`).

This enforces the same floors as benchmarks/gate_index_modes.py on a
CPU-sized corpus; the full 1M gate runs on hardware via that script.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))
from gate_index_modes import GATES, ground_truth  # noqa: E402

pytestmark = pytest.mark.gates

N, DIM, N_QUERIES, K = 6000, 32, 10, 10
# Clustered fixture: SIFT-shaped all-positive clustered data at the largest
# size CI can afford. Gaussian toys masked the round-2 IP-construction
# collapse for two rounds (commit 1186d0e) — clustered, all-positive,
# high-dim geometry is what broke it, so CI must include it.
NC, DIMC = 20_000, 64


def _make_clustered(n: int, n_q: int, dim: int, seed: int = 7):
    """Miniature of benchmarks/sift_bench.synth_sift (clustered, positive,
    SIFT-value-range) without the fvecs round-trip."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, 160, size=(256, dim)).astype(np.float32)
    cid = rng.integers(0, 256, size=n)
    data = np.clip(centers[cid] + rng.normal(0, 24, size=(n, dim)), 0, 255)
    qcid = rng.integers(0, 256, size=n_q)
    queries = np.clip(centers[qcid] + rng.normal(0, 24, size=(n_q, dim)), 0, 255)
    return data.astype(np.float32).round(), queries.astype(np.float32).round()


def _gate_fixture(tmp_path_factory, name, data, queries):
    import lynsedb_tpu as lynse

    client = lynse.VectorDBClient(str(tmp_path_factory.mktemp(name)))
    db = client.create_database("gate", drop_if_exists=True)
    coll = db.require_collection("base", dim=data.shape[1], default_index=None)
    coll.add(list(range(len(data))), vectors=data, batch_size=100_000)
    coll.commit()
    return client, (coll, data, queries)


@pytest.fixture(scope="module")
def gate_collection(tmp_path_factory):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(N, DIM)).astype(np.float32)
    queries = rng.normal(size=(N_QUERIES, DIM)).astype(np.float32)
    client, out = _gate_fixture(tmp_path_factory, "gates", data, queries)
    yield out
    client.close()


@pytest.fixture(scope="module")
def clustered_gate_collection(tmp_path_factory):
    data, queries = _make_clustered(NC, N_QUERIES, DIMC)
    client, out = _gate_fixture(tmp_path_factory, "gates_clustered", data, queries)
    yield out
    client.close()


def _run_gate(coll, data, queries, mode, floor, skw, bkw, n_rows):
    if "n_clusters" in bkw:
        # partition width tracks corpus size (the 256-cluster default is
        # tuned for the 50k+ script gate; ~100 rows/cluster here)
        bkw = {**bkw, "n_clusters": max(16, n_rows // 100)}
    coll.build_index(mode, **bkw)
    want = ground_truth(data, queries, mode, K)
    total = 0.0
    for i in range(len(queries)):
        res = coll.search(queries[i], k=K, **skw)
        got = set(int(x) for x in res.ids.tolist())
        total += len(got & set(want[i].tolist())) / K
    recall = total / len(queries)
    assert recall >= floor, f"{mode}: recall {recall:.4f} < floor {floor}"


@pytest.mark.parametrize("mode,floor,skw,bkw", GATES, ids=[g[0] for g in GATES])
def test_recall_floor(gate_collection, mode, floor, skw, bkw):
    coll, data, queries = gate_collection
    _run_gate(coll, data, queries, mode, floor, skw, bkw, N)


_CLUSTERED_MODES = [g for g in GATES if g[0].split("-")[0] in
                    ("HNSW", "DISKANN", "IVF", "SPANN")]


@pytest.mark.parametrize("mode,floor,skw,bkw", _CLUSTERED_MODES,
                         ids=[g[0] for g in _CLUSTERED_MODES])
def test_recall_floor_clustered(clustered_gate_collection, mode, floor, skw, bkw):
    """Approximate-index floors on clustered SIFT-shaped data (the gate
    distribution where graph/partition floors are actually reachable —
    reference calibration: benchmarks/gate_index_modes.py:259)."""
    coll, data, queries = clustered_gate_collection
    _run_gate(coll, data, queries, mode, floor, skw, bkw, NC)


@pytest.fixture(scope="module")
def norm_skewed_gate_collection(tmp_path_factory):
    """Raw-MIPS stress: clustered data with a 6x norm-skewed subset. MIPS
    winners concentrate in the high-norm band, which an angular graph only
    reaches through entry coverage — the failure mode behind the r4 gate's
    HNSW-IP/DISKANN-IP 0.89 rows (fixed by the 16384-row entry sample +
    IP beam oversample; this fixture keeps it fixed)."""
    data, queries = _make_clustered(NC, N_QUERIES, DIMC, seed=11)
    rng = np.random.default_rng(13)
    boost = rng.choice(len(data), size=len(data) // 50, replace=False)
    data[boost] *= 6.0
    client, out = _gate_fixture(tmp_path_factory, "gates_norm_skew", data, queries)
    yield out
    client.close()


_IP_GRAPH_MODES = [g for g in GATES if g[0] in ("HNSW-IP", "DISKANN-IP")]


@pytest.mark.parametrize("mode,floor,skw,bkw", _IP_GRAPH_MODES,
                         ids=[g[0] for g in _IP_GRAPH_MODES])
def test_recall_floor_norm_skewed_mips(norm_skewed_gate_collection, mode,
                                       floor, skw, bkw):
    coll, data, queries = norm_skewed_gate_collection
    _run_gate(coll, data, queries, mode, floor, skw, bkw, NC)
