"""Test harness config: force an 8-virtual-device CPU platform so sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; benches run on the real chip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a hardware plugin before conftest
# runs; the config knob wins over the env var.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def tmp_root(tmp_path):
    return str(tmp_path / "db_root")


@pytest.fixture
def client(tmp_root):
    import lynsedb_tpu as lynse

    return lynse.VectorDBClient(tmp_root)


@pytest.fixture
def db(client):
    return client.create_database("test_db", drop_if_exists=True)


@pytest.fixture
def populated_collection(db, rng):
    """20 x 8-dim collection mirroring the reference fixture shape
    (reference: tests/standard_tests/conftest.py:11-55)."""
    coll = db.require_collection("test_collection", dim=8, drop_if_exists=True)
    vectors = rng.normal(size=(20, 8)).astype(np.float32)
    ids = list(range(1, 21))
    fields = [{"idx": i, "group": "even" if i % 2 == 0 else "odd"} for i in ids]
    coll.add(ids, vectors=vectors, fields=fields)
    coll.commit()
    return coll, vectors, ids
