"""Mesh-sharded search and training: the multi-chip data plane.

This subsumes the reference's Rust cluster read-coordinator for the
single-host multi-chip case (reference: src/cluster.rs:25 RustReadCoordinator,
merge_search_blocks :327): the corpus shards across devices along a "corpus"
mesh axis, each shard computes a local fused top-k, and shard winners merge
with an all_gather over ICI. The query batch shards along a "data" axis.
K-means training runs the same way: per-shard partial sums reduced with psum
(this is the framework's "training step").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 promotes shard_map out of experimental (check_rep -> check_vma)
    from jax import shard_map
except ImportError:  # pragma: no cover — older jax
    from functools import wraps

    from jax.experimental.shard_map import shard_map as _legacy_shard_map

    @wraps(_legacy_shard_map)
    def shard_map(f=None, /, *, check_vma=True, **kw):
        return _legacy_shard_map(f, check_rep=check_vma, **kw)

from ..metrics import Metric
from ..ops import distance as D
from ..ops.topk import masked_top_k, merge_top_k


# Process-wide default mesh: when set, every new DeviceCorpus shards its
# corpus rows over the mesh's "corpus" axis (XLA SPMD inserts the top-k
# merge collectives). This is how a Collection serves multi-chip.
_DEFAULT_MESH: Mesh | None = None


def set_default_mesh(mesh: Mesh | None) -> None:
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def get_default_mesh() -> Mesh | None:
    return _DEFAULT_MESH


def corpus_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Rows sharded over the "corpus" axis, remaining dims replicated."""
    return NamedSharding(mesh, P("corpus", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_mesh(
    n_devices: int | None = None,
    data_axis: int = 1,
    devices=None,
    platform: str | None = None,
) -> Mesh:
    """Build a (data, corpus) mesh over available devices.

    ``devices`` supplies an explicit device list; otherwise ``platform``
    selects one (e.g. ``"cpu"`` for a virtual host mesh — pass it explicitly
    rather than relying on JAX_PLATFORMS, which hardware plugins can win
    over). Defaults to the default backend's devices.
    """
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    devs = np.array(devices[:n]).reshape(data_axis, n // data_axis)
    return Mesh(devs, axis_names=("data", "corpus"))


def sharded_search_fn(mesh: Mesh, *, metric: Metric, k: int):
    """Build a jitted sharded search step.

    Inputs: corpus (N, D) sharded over "corpus" rows; queries (B, D) sharded
    over "data"; valid (N,) sharded over "corpus".
    Output: (dists (B, k), ids (B, k)) — ids are global row ids; outputs are
    sharded over "data" like the queries.
    """
    ascending = metric.ascending

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("corpus", None), P("data", None), P("corpus")),
        out_specs=(P("data", None), P("data", None)),
        check_vma=False,
    )
    def step(x_local, q_local, valid_local):
        n_local = x_local.shape[0]
        shard = jax.lax.axis_index("corpus")
        ct = D.corpus_transform(x_local, metric)
        qt = D.query_transform(q_local, metric)
        scores = D.pairwise(qt, ct, metric)
        k_eff = min(k, n_local)
        d, i = masked_top_k(scores, k_eff, ascending, valid_local)
        i_global = (i + shard * n_local).astype(jnp.int32)
        # shard-local winners -> ICI all-gather -> merged top-k
        d_all = jax.lax.all_gather(d, "corpus", axis=1, tiled=True)  # (Bl, S*k)
        i_all = jax.lax.all_gather(i_global, "corpus", axis=1, tiled=True)
        return merge_top_k(d_all, i_all, k, ascending)

    return jax.jit(step)


def sharded_kmeans_step_fn(mesh: Mesh):
    """One sharded Lloyd iteration: assignment matmul per corpus shard,
    centroid sums reduced over the full mesh with psum."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("corpus", None), P(None, None), P("corpus")),
        out_specs=(P(None, None), P(None)),
        check_vma=False,
    )
    def step(x_local, centroids, valid_local):
        kc = centroids.shape[0]
        c_sq = jnp.sum(centroids * centroids, axis=-1)
        ip = jax.lax.dot_general(
            x_local, centroids.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x_sq = jnp.sum(x_local * x_local, axis=-1, keepdims=True)
        scores = x_sq + c_sq[None, :] - 2.0 * ip
        assign = jnp.argmin(scores, axis=-1)
        w = valid_local.astype(jnp.float32)
        one_hot = jax.nn.one_hot(assign, kc, dtype=jnp.float32) * w[:, None]
        sums = jax.lax.dot_general(
            one_hot.T, x_local,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = jnp.sum(one_hot, axis=0)
        # corpus rows are replicated across "data", so reduce over "corpus"
        # only — every data row computes identical partials.
        sums = jax.lax.psum(sums, "corpus")
        counts = jax.lax.psum(counts, "corpus")
        new_centroids = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids)
        return new_centroids, counts

    return jax.jit(step)


def shard_corpus(mesh: Mesh, corpus: np.ndarray, valid: np.ndarray):
    """Place a host corpus onto the mesh, padded to shard evenly."""
    n_shards = mesh.shape["corpus"]
    n = corpus.shape[0]
    n_pad = ((n + n_shards - 1) // n_shards) * n_shards
    if n_pad != n:
        corpus = np.concatenate([corpus, np.zeros((n_pad - n, corpus.shape[1]), corpus.dtype)])
        valid = np.concatenate([valid, np.zeros(n_pad - n, dtype=bool)])
    xs = jax.device_put(corpus, NamedSharding(mesh, P("corpus", None)))
    vs = jax.device_put(valid, NamedSharding(mesh, P("corpus")))
    return xs, vs


def shard_queries(mesh: Mesh, queries: np.ndarray):
    n_data = mesh.shape["data"]
    b = queries.shape[0]
    b_pad = ((b + n_data - 1) // n_data) * n_data
    if b_pad != b:
        queries = np.concatenate([queries, np.zeros((b_pad - b, queries.shape[1]), queries.dtype)])
    return jax.device_put(queries, NamedSharding(mesh, P("data", None))), b
