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


@pytest.fixture(scope="module")
def gate_collection(tmp_path_factory):
    import lynsedb_tpu as lynse

    rng = np.random.default_rng(0)
    data = rng.normal(size=(N, DIM)).astype(np.float32)
    queries = rng.normal(size=(N_QUERIES, DIM)).astype(np.float32)
    client = lynse.VectorDBClient(str(tmp_path_factory.mktemp("gates")))
    db = client.create_database("gate", drop_if_exists=True)
    coll = db.require_collection("base", dim=DIM, default_index=None)
    coll.add(list(range(N)), vectors=data, batch_size=100_000)
    coll.commit()
    yield coll, data, queries
    client.close()


@pytest.mark.parametrize("mode,floor,skw,bkw", GATES, ids=[g[0] for g in GATES])
def test_recall_floor(gate_collection, mode, floor, skw, bkw):
    coll, data, queries = gate_collection
    if "n_clusters" in bkw:
        # partition width tracks corpus size (the 256-cluster default is
        # tuned for the 50k+ script gate; ~100 rows/cluster here)
        bkw = {**bkw, "n_clusters": max(16, N // 100)}
    coll.build_index(mode, **bkw)
    want = ground_truth(data, queries, mode, K)
    total = 0.0
    for i in range(len(queries)):
        res = coll.search(queries[i], k=K, **skw)
        got = set(int(x) for x in res.ids.tolist())
        total += len(got & set(want[i].tolist())) / K
    recall = total / len(queries)
    assert recall >= floor, f"{mode}: recall {recall:.4f} < floor {floor}"
