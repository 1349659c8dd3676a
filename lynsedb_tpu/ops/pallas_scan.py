"""Pallas fused scan+top-C kernel for the bf16 first pass.

Reference match: src/storage/flat_mmap.rs:1173 exact_flat_search /
:4876 fused_topk_parallel — the reference fuses its SIMD distance loop with
per-thread top-k so candidate distances never round-trip through memory.

The XLA path (ops/scan.py bf16_pass_ids) materializes the (B, N) score
matrix to HBM between the matmul and the top-k: on-device loop timings at
1M x 128 / B=256 show ~1.9 ms/scan, which is ~745 GB/s of aggregate HBM
traffic (corpus read + score write + score read) — bandwidth-bound on the
*score* traffic, not the corpus. This kernel keeps each (B, TILE_N) score
tile in VMEM, reduces it to a per-tile top-C immediately, and only the
(n_tiles, B, C) candidates ever touch HBM, so the scan's HBM traffic drops
to ~the corpus bytes — a ~5x device-time ceiling raise at large B.

Enable with LYNSE_TPU_PALLAS=1 (TPU backend only; the XLA path remains the
default until perf is validated on directly-attached hardware — the dev
tunnel here cannot time sub-ms kernels reliably). Correctness is gated in
CI via interpret mode on CPU (tests/test_pallas_scan.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too; guard anyway
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from ..metrics import Metric
from .topk import merge_top_k

_NEG = float("-inf")  # plain float: jnp constants can't be captured by kernels

# (TILE_N, 128) bf16 tile = 2 MB VMEM + (B, TILE_N) f32 scores; B<=256 keeps
# the working set inside the ~16 MB VMEM budget with double buffering.
TILE_N = 8192


def use_pallas() -> bool:
    return (
        os.environ.get("LYNSE_TPU_PALLAS", "0") == "1"
        and jax.default_backend() == "tpu"
    )


def _scan_kernel(qc_ref, qmeta_ref, xm_ref, xcsq_ref, xsqt_ref, valid_ref,
                 x_ref, d_ref, i_ref, *, metric: Metric, c: int, ascending: bool):
    """``x_ref`` holds MEAN-CENTERED bf16 rows (see ops/scan.py
    _bf16_scores); per-row rank-1 corrections restore true-metric ranking.
    ``qc_ref``: centered queries; ``qmeta_ref``: (B, 2) [q.mean, |q|^2]."""
    t = pl.program_id(0)
    qc = qc_ref[:]  # (B, D) f32, already centered
    x = x_ref[:]  # (TILE_N, D) bf16 centered
    ip_c = jax.lax.dot_general(
        qc.astype(jnp.bfloat16), x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, TILE_N)
    xm = xm_ref[:, 0]  # (TILE_N,) mean.(x-mean)
    if metric is Metric.IP:
        scores = ip_c + xm[None, :]
    elif metric is Metric.L2:
        qc_sq = jnp.sum(qc * qc, axis=-1, keepdims=True)
        scores = jnp.maximum(qc_sq + xcsq_ref[:, 0][None, :] - 2.0 * ip_c, 0.0)
    else:  # cosine: true numerator and true norms
        num = ip_c + xm[None, :] + qmeta_ref[:, 0][:, None]
        denom = jnp.sqrt(qmeta_ref[:, 1][:, None] * xsqt_ref[:, 0][None, :])
        scores = jnp.where(denom < 1e-30, 1.0, 1.0 - num / jnp.maximum(denom, 1e-30))
    keyed = -scores if ascending else scores
    keyed = jnp.where(valid_ref[:, 0][None, :] > 0, keyed, _NEG)
    top, idx = jax.lax.top_k(keyed, c)  # per-tile top-C, scores never leave VMEM
    d_ref[0] = jnp.where(top > _NEG, -top if ascending else top,
                         float("inf") if ascending else _NEG)
    i_ref[0] = idx.astype(jnp.int32) + t * TILE_N


@partial(jax.jit, static_argnames=("metric", "c", "ascending", "interpret"))
def first_pass_topc(
    q: jnp.ndarray,       # (B, D) f32 raw queries
    x16: jnp.ndarray,     # (N_pad, D) bf16 MEAN-CENTERED rows, N_pad % TILE_N == 0
    aux: dict,            # mean (D,), xm (N_pad,), xc_sq (N_pad,), xsq_true (N_pad,)
    valid: jnp.ndarray,   # (N_pad,) bool
    *,
    metric: Metric,
    c: int,
    ascending: bool,
    interpret: bool = False,
):
    """Fused one-HBM-pass top-C shortlist. Returns (dists (B,C), ids (B,C))
    in the metric's native orientation (invalid slots -> +/-inf, id kept)."""
    n_pad, d = x16.shape
    b = q.shape[0]
    if n_pad % TILE_N != 0:
        raise ValueError(f"corpus rows {n_pad} not a multiple of {TILE_N}")
    grid = n_pad // TILE_N
    c_tile = min(c, TILE_N)
    kernel = partial(_scan_kernel, metric=metric, c=c_tile, ascending=ascending)
    kwargs = {}
    if not interpret and pltpu is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        )
    q = q.astype(jnp.float32)
    qc = q - aux["mean"][None, :]
    qmeta = jnp.stack(
        [q @ aux["mean"], jnp.sum(q * q, axis=-1)], axis=1
    )  # (B, 2): [q.mean, |q|^2] for the cosine correction
    d_tiles, i_tiles = pl.pallas_call(
        kernel,
        grid=(grid,),
        **kwargs,
        in_specs=[
            pl.BlockSpec((b, d), lambda t: (0, 0)),
            pl.BlockSpec((b, 2), lambda t: (0, 0)),
            pl.BlockSpec((TILE_N, 1), lambda t: (t, 0)),
            pl.BlockSpec((TILE_N, 1), lambda t: (t, 0)),
            pl.BlockSpec((TILE_N, 1), lambda t: (t, 0)),
            pl.BlockSpec((TILE_N, 1), lambda t: (t, 0)),
            pl.BlockSpec((TILE_N, d), lambda t: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, b, c_tile), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, b, c_tile), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, b, c_tile), jnp.float32),
            jax.ShapeDtypeStruct((grid, b, c_tile), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d,
            bytes_accessed=n_pad * d * 2 + grid * b * c_tile * 8,
            transcendentals=0,
        ),
    )(
        qc,
        qmeta,
        aux["xm"].reshape(n_pad, 1),
        aux["xc_sq"].reshape(n_pad, 1),
        aux["xsq_true"].reshape(n_pad, 1),
        valid.astype(jnp.int8).reshape(n_pad, 1),
        x16,
    )
    # (grid, B, C) -> (B, grid*C) cross-tile merge
    dd = jnp.moveaxis(d_tiles, 0, 1).reshape(b, grid * c_tile)
    ii = jnp.moveaxis(i_tiles, 0, 1).reshape(b, grid * c_tile)
    return merge_top_k(dd, ii, min(c, n_pad), ascending)
