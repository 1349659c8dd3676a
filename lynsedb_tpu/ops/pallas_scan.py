"""Pallas fused scan+top-C kernel for the bf16 first pass.

Reference match: src/storage/flat_mmap.rs:1173 exact_flat_search /
:4876 fused_topk_parallel — the reference fuses its SIMD distance loop with
per-thread top-k so candidate distances never round-trip through memory.

The XLA path (ops/scan.py bf16_pass_ids) materializes the (B, N) score
matrix between the matmul and the PartialReduce: measured on-device at
1M x 128 / B=256 it runs ~6.5 ms/scan with indices (39 GB/s effective
corpus bandwidth, benchmarks/xla_scan_variants_r04.log) — ~20x off the
HBM speed-of-light 0.32 ms. This kernel keeps each (B, TILE_N) score tile
in VMEM and reduces it immediately, so the scan's HBM traffic drops to
~the corpus bytes.

In-kernel selection: ``jax.lax.top_k`` has NO Mosaic-TPU lowering on this
JAX (NotImplementedError: "Unimplemented primitive ... top_k",
benchmarks/pallas_probe_r04.log), so the kernel selects via R rounds of
bucketed max-extraction over 128-lane buckets — max, first-argmax (via
min-over-iota), mask, repeat — all mosaic-supported primitives. Each tile
emits the top-R of every 128-row bucket (NB*R >= C candidates); a true
top-k item is lost only if >R better candidates share its 128-row bucket
(p ~ (k choose R+1) / (N/128)^R — negligible at shortlist sizes), and the
shortlist feeds an exact rescore, so end-to-end recall stays at the
exact-flat gate floor.

Enable with LYNSE_TPU_PALLAS=1 (TPU backend only; the XLA path remains the
default until perf is validated on hardware). Correctness is gated in CI
via interpret mode on CPU (tests/test_pallas_scan.py).
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

# (TILE_N, 128) bf16 tile = 2 MB VMEM + a (B, TILE_N) f32 score tile; at
# B<=256 the working set stays inside the VMEM budget with double buffering.
TILE_N = 8192
BUCKET_W = 128  # selection bucket = one lane group


def use_pallas() -> bool:
    return (
        os.environ.get("LYNSE_TPU_PALLAS", "0") == "1"
        and jax.default_backend() == "tpu"
    )


def _bucket_topr(keyed: jnp.ndarray, rounds: int):
    """(B, T) descending-key scores -> (vals (B, NB*rounds), pos (B, NB*rounds))
    where NB = T // BUCKET_W: the top-``rounds`` of every 128-lane bucket,
    selected with mosaic-supported primitives only (max / min reduces,
    compares, selects, broadcasted_iota — lax.top_k has no TPU lowering)."""
    b, t = keyed.shape
    nb = t // BUCKET_W
    s = keyed.reshape(b, nb, BUCKET_W)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, nb, BUCKET_W), 2)
    bucket = jax.lax.broadcasted_iota(jnp.int32, (b, nb), 1)
    vals, ids = [], []
    for _ in range(rounds):
        m = jnp.max(s, axis=2)  # (B, NB)
        is_max = s == m[:, :, None]
        # first argmax: min lane index among the maxima (ties break low,
        # matching lax.top_k's deterministic tie rule)
        pos = jnp.min(jnp.where(is_max, lane, BUCKET_W), axis=2)  # (B, NB)
        vals.append(m)
        ids.append(bucket * BUCKET_W + jnp.where(pos < BUCKET_W, pos, 0))
        s = jnp.where(lane == pos[:, :, None], _NEG, s)
    return (
        jnp.concatenate(vals, axis=1),
        jnp.concatenate(ids, axis=1),
    )


def _scan_kernel(qc_ref, qmeta_ref, xm_ref, xcsq_ref, xsqt_ref, valid_ref,
                 x_ref, d_ref, i_ref, *, metric: Metric, rounds: int,
                 ascending: bool):
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
    # valid arrives as i32: Mosaic on v5e rejects sub-word (i8) vector
    # compares ("Target does not support this comparison", arith.cmpi i8)
    keyed = jnp.where(valid_ref[:, 0][None, :] > 0, keyed, _NEG)
    top, idx = _bucket_topr(keyed, rounds)  # scores never leave VMEM
    d_ref[0] = jnp.where(top > _NEG, -top if ascending else top,
                         float("inf") if ascending else _NEG)
    i_ref[0] = idx + t * TILE_N


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
    nb = TILE_N // BUCKET_W
    # +1 round of safety margin over ceil(c/nb): a tile emits NB*rounds
    # bucketed candidates, so >R-per-bucket collisions cannot starve the
    # global shortlist
    rounds = min(max(2, -(-min(c, TILE_N) // nb) + 1), BUCKET_W)
    c_tile = nb * rounds
    kernel = partial(_scan_kernel, metric=metric, rounds=rounds,
                     ascending=ascending)
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
        valid.astype(jnp.int32).reshape(n_pad, 1),
        x16,
    )
    # (grid, B, C_tile) -> (B, grid*C_tile) cross-tile merge
    dd = jnp.moveaxis(d_tiles, 0, 1).reshape(b, grid * c_tile)
    ii = jnp.moveaxis(i_tiles, 0, 1).reshape(b, grid * c_tile)
    return merge_top_k(dd, ii, min(c, n_pad), ascending)
