"""The flat-scan engine: HBM-resident corpus blocks + fused distance/top-k.

This replaces the reference's mmap scan engine (reference:
src/storage/flat_mmap.rs — rayon-chunked SIMD scan with per-thread top-k and
merge, :1173/:4876). The TPU formulation:

  * The corpus lives in HBM **bfloat16** (half the bytes of f32, so twice
    the scan bandwidth) plus an exact **f32 mirror in host RAM** (the moral
    equivalent of the reference's mmap bytes).
  * The default search for the dot-product family is **two-pass**: one fused
    bf16 matmul + masked top-C shortlist on device (a single dispatch, a
    single small fetch), then an exact f32 rescore of the C candidates on
    the host mirror. Final distances are exact f32; the shortlist is 4-16x
    oversampled so selection recall is ~1.0 (gated at 0.999, the reference's
    own exact-flat floor). ``mode="exact"`` forces the one-pass f32 scan
    (reference parity path), which lazily stages an f32 corpus copy.
  * Selective filters switch to **gather-then-scan**: candidate row indices
    gather a compact block on device and only that block is scanned
    (reference policy: engine.rs:95-102 should_use_exact_filtered_search).
  * Validity/tombstone masks and filter index blocks are cached on device
    and invalidated by an epoch counter, so steady-state search is one
    dispatch with zero per-query host re-uploads.

Device staging is lazy: writes touch a host mirror; the bf16 HBM array is
(re)built on demand with bucketed capacities (~8 compile shapes per
power-of-two octave) and eagerly at commit via ``finalize()``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ..metrics import MATMUL_METRICS, Metric
from . import distance as D
from .topk import masked_top_c, masked_top_k, merge_top_k

# Pad granularity for the corpus row dimension. Keeping it a multiple of the
# MXU/VPU lane width keeps every chunk fully tiled.
ROW_BLOCK = 8192

# Chunk sizes for the lax.map scan fallbacks: matmul metrics touch (C, D) +
# (B, C) per step; elementwise metrics materialize (B, C, D) lanes, so they
# use smaller chunks.
MATMUL_CHUNK = 131072
ELEMWISE_CHUNK = 8192

# score-matrix element budget for the single-shot path (B * N_pad f32)
SINGLE_SHOT_BUDGET = 1 << 28  # 256M elems = 1 GB HBM scratch

# Metrics served by the bf16 first pass + exact f32 host rescore.
TWO_PASS_METRICS = (Metric.IP, Metric.L2, Metric.COSINE)
# Below this row count the one-pass f32 exact scan wins (tiny compile, tiny
# data) and keeps unit-scale behavior bit-deterministic.
TWO_PASS_MIN_ROWS = 4096

# Filtered-search policy thresholds (reference: engine.rs:95-102): a subset
# this selective is gathered into a compact block instead of masked-scanned.
GATHER_MAX_ROWS = 100_000

# Query batches are padded up to one of these sizes so every batch shape in
# [1, 256] reuses one of THREE compiled executables. The device cost of the
# padding is noise (a full-corpus scan at B=16 costs the same HBM pass as
# B=1), but each *distinct* shape costs a full server-side compile on first
# execution (~45-200 s through the dev tunnel; measured in
# benchmarks/warmup_probe_r03.log) and a recompile on real hardware too.
BATCH_BUCKETS = (16, 64, 256)


def _batch_bucket(b: int) -> int:
    for s in BATCH_BUCKETS:
        if b <= s:
            return s
    return b

# Host mirrors larger than this spill to disk-backed memmaps (the OS pages
# them), lifting the host-RAM bound on corpus size the same way the
# reference's mmap storage does (flat_mmap.rs:89).
import os as _os

MIRROR_RAM_BYTES = int(_os.environ.get("LYNSE_TPU_MIRROR_RAM_BYTES", 16 * 1024**3))

# Single-chip HBM budget for the resident bf16 scan array. Corpora whose
# bf16 footprint exceeds it switch to the blockwise *streaming* scan: the
# bf16 copy stays in a host mirror (memmap-spilled like the f32 mirror) and
# search double-buffers fixed-shape blocks through the device, carrying a
# running top-C state across block dispatches so the whole pass costs ONE
# host sync (reference capability: mmap segments scanned beyond RAM,
# flat_mmap.rs:89).
HBM_BYTES = int(_os.environ.get("LYNSE_TPU_HBM_BYTES", 12 * 1024**3))
STREAM_BLOCK_BYTES = int(_os.environ.get("LYNSE_TPU_STREAM_BLOCK_BYTES", 1 << 30))
# Streaming-scan backpressure: total bf16 block bytes allowed in flight
# before a sync point. Each sync is a tiny D2H fetch that costs a full
# transport round trip (~33 ms through the dev tunnel,
# benchmarks/dispatch_floor_r05.log) — syncing every other block made the
# 1M/8-block streaming pass pay 4 RTTs per dispatch (r4: 143.9 ms/q
# pipelined when the scans themselves were ~2 ms). Bounding by BYTES keeps
# small passes sync-free while still capping in-flight HBM on 60M-scale
# pumps.
STREAM_INFLIGHT_BYTES = int(_os.environ.get("LYNSE_TPU_STREAM_INFLIGHT_BYTES", 3 << 30))

# When the f32 device copy fits the HBM budget alongside the bf16 scan array
# (6 bytes/element total), the exact second pass runs ON DEVICE fused into
# the first-pass dispatch, and the host fetches only the packed (B, 3k)
# result (~kB). With host rescore the fetch is the (B, C) int32 shortlist —
# 256 KB at B=256/C=256, which costs ~55 ms through the dev tunnel
# (benchmarks/dispatch_floor_r05.log: 33 ms floor + ~11 MB/s) and was the
# entire batch-search budget (BENCH: 64.8 ms/batch pipelined when the scan
# itself is 1.9 ms). Reference fuses selection + exact scoring into its scan
# loop the same way (src/storage/flat_mmap.rs:4876 fused_topk_parallel).
DEVICE_RESCORE = _os.environ.get("LYNSE_TPU_DEVICE_RESCORE", "1") != "0"


def _alloc_rows(n_rows: int, dim: int, np_dtype) -> np.ndarray:
    """RAM array below MIRROR_RAM_BYTES, anonymous-temp-file memmap above."""
    nbytes = n_rows * dim * np.dtype(np_dtype).itemsize
    if nbytes <= MIRROR_RAM_BYTES:
        return np.zeros((n_rows, dim), dtype=np_dtype)
    import tempfile

    f = tempfile.TemporaryFile(prefix="lynse_mirror_")
    f.truncate(nbytes)
    mm = np.memmap(f, dtype=np_dtype, mode="r+", shape=(n_rows, dim))
    mm._lynse_backing = f  # keep the fd alive with the array
    return mm


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kick_d2h(arr) -> None:
    """Start the device->host copy of a dispatched result immediately.

    The tunnel's D2H fetch costs ~33 ms of round-trip latency per array
    (benchmarks/dispatch_floor_r05.log) and np.asarray only starts it at
    resolve time — serializing the fetch of window i with the scan of
    window i+1 in pipelined streams. copy_to_host_async enqueues the
    transfer right behind the compute in stream order, so by resolve time
    the bytes are (mostly) already local. No-op where unsupported."""
    try:
        arr.copy_to_host_async()
    except Exception:  # noqa: BLE001 — an eager copy is only an optimization
        pass


def scan_chunk_size(metric: Metric, n_pad: int, batch: int = 1) -> int:
    if metric in MATMUL_METRICS:
        # Matmul metrics materialize only (B, N) scores: single-shot lets XLA
        # fuse matmul + top-k at full HBM bandwidth. Chunk only when the
        # score matrix would be too large.
        if batch * n_pad <= SINGLE_SHOT_BUDGET:
            return n_pad
        return MATMUL_CHUNK
    return min(ELEMWISE_CHUNK, n_pad)


# ── id packing ────────────────────────────────────────────────────────────
# Int ids are encoded as *normal* f32 values (a raw bitcast of small ints
# makes denormals, which the TPU flushes to zero in transit): 12-bit lo + hi
# halves are exactly representable and cover ids up to 2^31.


def _pack_ids(dists: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    ids = ids.astype(jnp.int32)
    hi = (ids >> 12).astype(jnp.float32)
    lo = (ids & 0xFFF).astype(jnp.float32)
    return jnp.concatenate([dists, hi, lo], axis=-1)


def unpack_search_step(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side decode of a packed (B, 3k) search result."""
    packed = np.asarray(packed)
    k = packed.shape[-1] // 3
    dists = packed[:, :k].astype(np.float32)
    hi = packed[:, k : 2 * k].astype(np.int64)
    lo = packed[:, 2 * k :].astype(np.int64)
    return dists, (hi << 12) | lo


# ── fused one-pass f32 exact kernels (reference parity path) ─────────────


@partial(jax.jit, static_argnames=("metric", "k", "chunk", "ascending"))
def flat_topk(
    qt: dict,
    ct: dict,
    valid: jnp.ndarray,
    *,
    metric: Metric,
    k: int,
    chunk: int,
    ascending: bool,
):
    """Fused chunked scan: per-chunk distances -> per-chunk top-k -> merge.

    ``qt``: query transform (leaves lead with B). ``ct``: corpus transform
    (leaves lead with N_pad, a multiple of ``chunk``). ``valid``: (N_pad,)
    bool — rows in-range, not tombstoned, and passing any filter.
    Returns (dists (B,k'), ids (B,k')) with k' = min(k, N_pad).
    """
    n_pad = valid.shape[0]
    k_eff = min(k, n_pad)
    n_chunks = n_pad // chunk

    if n_chunks <= 1:
        scores = D.pairwise(qt, ct, metric)
        return masked_top_k(scores, k_eff, ascending, valid)

    kc = min(k_eff, chunk)
    n_main = n_chunks * chunk
    ct_main = jax.tree.map(lambda a: a[:n_main].reshape((n_chunks, chunk) + a.shape[1:]), ct)
    valid_main = valid[:n_main].reshape(n_chunks, chunk)
    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[:, None]

    def body(operand):
        ct_c, valid_c, base = operand
        scores = D.pairwise(qt, ct_c, metric)
        d, i = masked_top_k(scores, kc, ascending, valid_c)
        return d, (i + base[0]).astype(jnp.int32)

    dists, ids = jax.lax.map(body, (ct_main, valid_main, bases))
    b = dists.shape[1]
    # (n_chunks, B, kc) -> (B, n_chunks*kc)
    dists = jnp.moveaxis(dists, 0, 1).reshape(b, n_chunks * kc)
    ids = jnp.moveaxis(ids, 0, 1).reshape(b, n_chunks * kc)

    if n_main < n_pad:  # remainder tail, scanned single-shot
        ct_tail = jax.tree.map(lambda a: a[n_main:], ct)
        scores = D.pairwise(qt, ct_tail, metric)
        d_t, i_t = masked_top_k(scores, min(k_eff, n_pad - n_main), ascending, valid[n_main:])
        dists = jnp.concatenate([dists, d_t], axis=1)
        ids = jnp.concatenate([ids, (i_t + n_main).astype(jnp.int32)], axis=1)
    return merge_top_k(dists, ids, k_eff, ascending)


@partial(jax.jit, static_argnames=("metric", "chunk"))
def flat_scores(qt: dict, ct: dict, valid: jnp.ndarray, *, metric: Metric, chunk: int):
    """Full (B, N_pad) score matrix with invalid rows as NaN — used by
    range search and exact rescoring paths."""
    n_pad = valid.shape[0]
    n_chunks = n_pad // chunk
    if n_chunks <= 1:
        scores = D.pairwise(qt, ct, metric)
        return jnp.where(valid[None, :], scores, jnp.nan)
    n_main = n_chunks * chunk
    ct_main = jax.tree.map(lambda a: a[:n_main].reshape((n_chunks, chunk) + a.shape[1:]), ct)
    valid_main = valid[:n_main].reshape(n_chunks, chunk)

    def body(operand):
        ct_c, valid_c = operand
        scores = D.pairwise(qt, ct_c, metric)
        return jnp.where(valid_c[None, :], scores, jnp.nan)

    out = jax.lax.map(body, (ct_main, valid_main))
    out = jnp.moveaxis(out, 0, 1).reshape(out.shape[1], n_main)
    if n_main < n_pad:
        ct_tail = jax.tree.map(lambda a: a[n_main:], ct)
        scores = D.pairwise(qt, ct_tail, metric)
        tail = jnp.where(valid[None, n_main:], scores, jnp.nan)
        out = jnp.concatenate([out, tail], axis=1)
    return out


@partial(jax.jit, static_argnames=("metric", "k", "chunk", "ascending"))
def flat_search_step(
    q: jnp.ndarray,
    ct: dict,
    valid: jnp.ndarray,
    *,
    metric: Metric,
    k: int,
    chunk: int,
    ascending: bool,
) -> jnp.ndarray:
    """Fully-fused single-dispatch f32 search: raw queries in, one packed
    (B, 3k) f32 array out (distances, id-hi, id-lo)."""
    qt = D.query_transform(q, metric)
    dists, ids = flat_topk(qt, ct, valid, metric=metric, k=k, chunk=chunk, ascending=ascending)
    return _pack_ids(dists, ids)


# ── fused bf16 first-pass kernels ─────────────────────────────────────────


def _bf16_scores(q: jnp.ndarray, x16: jnp.ndarray, aux: dict, metric: Metric):
    """(B, C) proxy scores from a MEAN-CENTERED bf16 corpus block.

    ``x16`` stores ``x - mean`` in bf16: centering removes the corpus's
    common component before rounding, so bf16 precision is spent on the
    discriminative part (uncentered, score spread on low-variance data is
    comparable to the bf16 rounding noise — measured recall@10 0.995 vs the
    0.999 exact-flat floor at 1M uniform rows). Rankings are exactly
    preserved via per-row rank-1 corrections:

      q.x   = (q-m).(x-m) + m.(x-m) + q.m  ->  ip_c + xm + const(q)
      |q-x| =  |(q-m) - (x-m)|             ->  centered L2 directly

    ``aux``: mean (D,), xm (C,) = m.(x-m) per row, xc_sq (C,) = centered-row
    norms, xsq_true (C,) = true row norms (cosine only; XLA DCEs unused
    inputs)."""
    qc = q - aux["mean"][None, :]
    ip_c = jax.lax.dot_general(
        qc.astype(jnp.bfloat16), x16.T, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if metric is Metric.IP:
        return ip_c + aux["xm"][None, :]
    if metric is Metric.L2:
        qc_sq = jnp.sum(qc * qc, axis=-1, keepdims=True)
        return jnp.maximum(qc_sq + aux["xc_sq"][None, :] - 2.0 * ip_c, 0.0)
    # cosine: true numerator and true norms
    num = ip_c + aux["xm"][None, :] + jnp.sum(q * aux["mean"][None, :], axis=-1, keepdims=True)
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    denom = jnp.sqrt(q_sq * aux["xsq_true"][None, :])
    return jnp.where(denom < 1e-30, 1.0, 1.0 - num / jnp.maximum(denom, 1e-30))


def _shortlist_ids(d: jnp.ndarray, i: jnp.ndarray, ascending: bool) -> jnp.ndarray:
    """(B, C) int32 shortlist with invalid slots as -1. The first pass's
    proxy distances are used ONLY as a validity signal (the exact scores
    come from the host-mirror rescore), so fetching ids alone cuts the
    device->host transfer to a third of the packed layout."""
    keyed = -d if ascending else d
    return jnp.where(keyed > NEG_INF_F32, i.astype(jnp.int32), jnp.int32(-1))


NEG_INF_F32 = np.float32(-np.inf)  # host scalar: device constants stall tunnel lowering (see ops/distance.py:INF)


@partial(jax.jit, static_argnames=("metric", "k", "ascending"))
def bf16_pass_ids(
    q: jnp.ndarray,
    x16: jnp.ndarray,
    aux: dict,
    valid: jnp.ndarray,
    *,
    metric: Metric,
    k: int,
    ascending: bool,
) -> jnp.ndarray:
    """Single-dispatch bf16 first pass over the full corpus: (B, C) int32
    shortlist ids, invalid slots -1. Shortlist selection rides approx_max_k
    (exact host rescore follows).

    A hand-fused Pallas twin of this pass lived here for rounds 2-5 behind
    LYNSE_TPU_PALLAS=1; its Mosaic compile never completed through the dev
    tunnel in four timed attempts (benchmarks/pallas_probe_r0{4,5}.log)
    while this XLA path sustains 1.6-2.3 ms per 1M x 128 B=256 scan
    (benchmarks/topc_epilogue_r05.log), so the kernel was removed rather
    than shipped unvalidated."""
    scores = _bf16_scores(q, x16, aux, metric)
    d, i = masked_top_c(scores, k, ascending, valid)
    return _shortlist_ids(d, i, ascending)


@partial(jax.jit, static_argnames=("metric", "k", "ascending", "window"))
def bf16_pass_ids_window(
    qblock: jnp.ndarray,
    start: jnp.ndarray,
    x16: jnp.ndarray,
    aux: dict,
    valid: jnp.ndarray,
    *,
    metric: Metric,
    k: int,
    ascending: bool,
    window: int,
) -> jnp.ndarray:
    """Streaming variant: the query stream is uploaded once as ``qblock``
    and each window slices it on device — one H2D per stream instead of one
    per window. Returns (window, C) int32 shortlist ids (invalid -1)."""
    q = jax.lax.dynamic_slice(qblock, (start, 0), (window, qblock.shape[1]))
    scores = _bf16_scores(q, x16, aux, metric)
    d, i = masked_top_c(scores, k, ascending, valid)
    return _shortlist_ids(d, i, ascending)


@partial(jax.jit, static_argnames=("metric", "k", "ascending"))
def bf16_gather_pass_ids(
    q: jnp.ndarray,
    x16: jnp.ndarray,
    idx: jnp.ndarray,
    idx_valid: jnp.ndarray,
    aux: dict,
    base_valid: jnp.ndarray,
    *,
    metric: Metric,
    k: int,
    ascending: bool,
) -> jnp.ndarray:
    """Gather-then-scan first pass: only the ``idx`` rows (S_pad of them,
    padded with idx_valid=False) are scored. ``base_valid`` carries the
    in-range/tombstone mask of the full corpus. Returns (B, C) int32 LOCAL
    subset positions (invalid -1); the caller maps them back through its
    index list."""
    rows = jnp.take(x16, idx, axis=0)  # (S_pad, D) device gather
    sub_aux = {
        "mean": aux["mean"],
        "xm": jnp.take(aux["xm"], idx, axis=0),
        "xc_sq": jnp.take(aux["xc_sq"], idx, axis=0),
        "xsq_true": jnp.take(aux["xsq_true"], idx, axis=0),
    }
    ok = idx_valid & jnp.take(base_valid, idx, axis=0)
    scores = _bf16_scores(q, rows, sub_aux, metric)
    d, i = masked_top_c(scores, k, ascending, ok)
    return _shortlist_ids(d, i, ascending)


@partial(jax.jit, static_argnames=("metric", "s", "c"))
def shortlist_device_rescore_ids(
    q: jnp.ndarray,
    approx: jnp.ndarray,
    x16: jnp.ndarray,
    aux: dict,
    valid: jnp.ndarray,
    *,
    metric: Metric,
    s: int,
    c: int,
) -> jnp.ndarray:
    """Fused second stage for quantized shortlists: top-S by the approximate
    (B, N) code-scan scores, near-exact bf16 rescore of those S rows gathered
    from the resident centered corpus (same rank-1 correction math as
    :func:`_bf16_scores`), then top-C — all one device chain, so the caller
    fetches only a (B, C) int32 id block (~1 KB) instead of the (B, S)
    shortlist (the D2H fetch is the sequential-latency floor through the
    tunnel: 33 ms for any size up to ~1 KB, 55 ms at 64 KB —
    benchmarks/dispatch_floor_r05.log). Reference fuses selection into its
    scan loop the same way (src/storage/flat_mmap.rs:4876)."""
    ascending = metric.ascending
    n = approx.shape[1]
    d1, cand = masked_top_c(approx, s, ascending, valid[:n])
    keyed1 = -d1 if ascending else d1
    ok = keyed1 > NEG_INF_F32
    safe = jnp.where(ok, cand, 0).astype(jnp.int32)
    rows = jnp.take(x16, safe, axis=0)  # (B, S, D) bf16 gather
    qc = q - aux["mean"][None, :]
    ip_c = jnp.einsum(
        "bd,bsd->bs", qc.astype(jnp.bfloat16), rows,
        preferred_element_type=jnp.float32,
    )
    if metric is Metric.IP:
        sc = ip_c + jnp.take(aux["xm"], safe, axis=0)
    elif metric is Metric.L2:
        qc_sq = jnp.sum(qc * qc, axis=-1, keepdims=True)
        sc = jnp.maximum(qc_sq + jnp.take(aux["xc_sq"], safe, axis=0) - 2.0 * ip_c, 0.0)
    else:  # cosine: true numerator over true norms
        num = ip_c + jnp.take(aux["xm"], safe, axis=0) + jnp.sum(
            q * aux["mean"][None, :], axis=-1, keepdims=True)
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        denom = jnp.sqrt(q_sq * jnp.take(aux["xsq_true"], safe, axis=0))
        sc = jnp.where(denom < 1e-30, 1.0, 1.0 - num / jnp.maximum(denom, 1e-30))
    d2, j = masked_top_k(sc, c, ascending, ok)
    gid = jnp.take_along_axis(cand, j, axis=1)
    keyed2 = -d2 if ascending else d2
    return jnp.where(keyed2 > NEG_INF_F32, gid.astype(jnp.int32), jnp.int32(-1))


def _exact_rescore_packed_body(
    q: jnp.ndarray,
    x16: jnp.ndarray,
    aux: dict,
    x32: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    metric: Metric,
    k: int,
    c: int,
    ascending: bool,
) -> jnp.ndarray:
    """Fused two-pass search, all on device: bf16 proxy scan -> top-C
    shortlist -> exact f32 rescore of the gathered shortlist rows -> stable
    (score, id)-ordered top-k -> packed (B, 3k). One dispatch chain, one
    ~kB D2H fetch — replaces the (B, C) shortlist fetch + host-mirror
    rescore whose transfer alone cost the whole batch budget through the
    dev tunnel (see DEVICE_RESCORE above). Score math mirrors
    :func:`host_exact_scores` term-for-term; the tie order mirrors
    :func:`DeviceCorpus._rescore_topk`'s lexsort (best score first, lower
    id wins ties)."""
    scores = _bf16_scores(q, x16, aux, metric)
    d1, cand = masked_top_c(scores, c, ascending, valid)
    keyed1 = -d1 if ascending else d1
    ok = keyed1 > NEG_INF_F32
    safe = jnp.where(ok, cand, 0).astype(jnp.int32)
    return _rescore_sort_pack(q, x32, safe, ok, metric=metric, k=k,
                              ascending=ascending)


def _rescore_sort_pack(
    q: jnp.ndarray,
    x32: jnp.ndarray,
    safe: jnp.ndarray,
    ok: jnp.ndarray,
    *,
    metric: Metric,
    k: int,
    ascending: bool,
) -> jnp.ndarray:
    """Exact f32 rescore of a (B, C) global-id shortlist gathered from the
    resident f32 corpus, stable (score, id)-ordered top-k, packed (B, 3k)."""
    rows = jnp.take(x32, safe, axis=0)  # (B, C, D) f32 gather
    ip = jnp.einsum("bd,bcd->bc", q, rows, precision=jax.lax.Precision.HIGHEST)
    if metric is Metric.IP:
        exact = ip
    else:
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        r_sq = jnp.sum(rows * rows, axis=-1)
        if metric is Metric.L2:
            exact = jnp.maximum(q_sq + r_sq - 2.0 * ip, 0.0)
        else:  # cosine
            denom = jnp.sqrt(q_sq * r_sq)
            exact = jnp.where(denom < 1e-30, 1.0,
                              1.0 - ip / jnp.maximum(denom, 1e-30))
    keyed = -exact if ascending else exact
    keyed = jnp.where(ok, keyed, NEG_INF_F32)
    # two-key sort: primary -keyed ascending (best score first), secondary
    # id ascending (lower id wins exact ties) — same order as the host
    # rescore's np.lexsort((id, -key))
    sk, si, sd = jax.lax.sort((-keyed, safe, exact), num_keys=2)
    kk = min(k, safe.shape[-1])
    d = jax.lax.slice_in_dim(sd, 0, kk, axis=1)
    i = jax.lax.slice_in_dim(si, 0, kk, axis=1)
    kept = jax.lax.slice_in_dim(sk, 0, kk, axis=1) < -NEG_INF_F32
    fill = -NEG_INF_F32 if ascending else NEG_INF_F32  # decode drops these
    d = jnp.where(kept, d, fill)
    return _pack_ids(d, jnp.where(kept, i, 0))


@partial(jax.jit, static_argnames=("metric", "k", "c", "ascending"))
def bf16_gather_exact_pass_packed(
    q: jnp.ndarray,
    x16: jnp.ndarray,
    idx: jnp.ndarray,
    idx_valid: jnp.ndarray,
    aux: dict,
    base_valid: jnp.ndarray,
    x32: jnp.ndarray,
    *,
    metric: Metric,
    k: int,
    c: int,
    ascending: bool,
) -> jnp.ndarray:
    """Gather-then-scan twin of :func:`bf16_exact_pass_packed` for selective
    filters: proxy-score only the ``idx`` subset rows, shortlist top-C, then
    exact-rescore with GLOBAL row ids — the fetch is the packed (B, 3k)."""
    rows16 = jnp.take(x16, idx, axis=0)  # (S_pad, D)
    sub_aux = {
        "mean": aux["mean"],
        "xm": jnp.take(aux["xm"], idx, axis=0),
        "xc_sq": jnp.take(aux["xc_sq"], idx, axis=0),
        "xsq_true": jnp.take(aux["xsq_true"], idx, axis=0),
    }
    ok_rows = idx_valid & jnp.take(base_valid, idx, axis=0)
    scores = _bf16_scores(q, rows16, sub_aux, metric)
    d1, local = masked_top_c(scores, c, ascending, ok_rows)
    keyed1 = -d1 if ascending else d1
    ok = keyed1 > NEG_INF_F32
    safe_local = jnp.where(ok, local, 0).astype(jnp.int32)
    safe = jnp.take(idx, safe_local, axis=0).astype(jnp.int32)  # global ids
    return _rescore_sort_pack(q, x32, safe, ok, metric=metric, k=k,
                              ascending=ascending)


@partial(jax.jit, static_argnames=("metric", "k", "c", "ascending"))
def bf16_exact_pass_packed(
    q: jnp.ndarray,
    x16: jnp.ndarray,
    aux: dict,
    x32: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    metric: Metric,
    k: int,
    c: int,
    ascending: bool,
) -> jnp.ndarray:
    return _exact_rescore_packed_body(
        q, x16, aux, x32, valid, metric=metric, k=k, c=c, ascending=ascending)


@partial(jax.jit, static_argnames=("metric", "k", "c", "ascending", "window"))
def bf16_exact_pass_packed_window(
    qblock: jnp.ndarray,
    start: jnp.ndarray,
    x16: jnp.ndarray,
    aux: dict,
    x32: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    metric: Metric,
    k: int,
    c: int,
    ascending: bool,
    window: int,
) -> jnp.ndarray:
    """Streaming-window twin of :func:`bf16_exact_pass_packed`: the query
    stream is uploaded once and sliced on device (one H2D per stream)."""
    q = jax.lax.dynamic_slice(qblock, (start, 0), (window, qblock.shape[1]))
    return _exact_rescore_packed_body(
        q, x16, aux, x32, valid, metric=metric, k=k, c=c, ascending=ascending)


def _stream_block_body(
    q: jnp.ndarray,
    x16: jnp.ndarray,
    aux: dict,
    valid: jnp.ndarray,
    prev_packed: jnp.ndarray,
    base: jnp.ndarray,
    *,
    metric: Metric,
    c: int,
    ascending: bool,
    chunk: int,
) -> jnp.ndarray:
    """One streaming-scan step: score a corpus block, take its top-C, merge
    with the carried top-C state, return the new packed (B, 3C) state.

    The whole block sequence is dispatched asynchronously — device i+1's
    H2D overlaps block i's scan — and only the final state is fetched.
    ``base`` is the block's global row offset. The carried proxy values are
    rank-consistent across blocks because every block shares one mean."""
    if metric in TWO_PASS_METRICS:
        scores = _bf16_scores(q, x16, aux, metric)
        d, i = masked_top_c(scores, c, ascending, valid)
    else:
        d, i = bf16_flat_topk(q, x16, aux["mean"], valid, metric=metric, k=c, chunk=chunk)
    gid = i.astype(jnp.int32) + base
    pd = prev_packed[:, :c]
    hi = prev_packed[:, c : 2 * c].astype(jnp.int32)
    lo = prev_packed[:, 2 * c :].astype(jnp.int32)
    pid = (hi << 12) | lo
    md, mi = merge_top_k(
        jnp.concatenate([pd, d], axis=1),
        jnp.concatenate([pid, gid], axis=1),
        c,
        ascending,
    )
    return _pack_ids(md, mi)


@partial(jax.jit, static_argnames=("metric", "c", "ascending", "chunk"))
def stream_block_packed_multi(
    qs: jnp.ndarray,
    x16: jnp.ndarray,
    aux: dict,
    valid: jnp.ndarray,
    prev: jnp.ndarray,
    base: jnp.ndarray,
    *,
    metric: Metric,
    c: int,
    ascending: bool,
    chunk: int,
) -> jnp.ndarray:
    """Advance EVERY query chunk's carried state across one corpus block in
    a single dispatch: lax.map over the chunk axis keeps the score scratch
    one chunk wide ((qc, block) at a time) while collapsing the per-chunk
    dispatch overhead — through the dev tunnel each extra dispatch
    referencing the staged block costs real enqueue time, which dominated
    long streams (1000 queries = 16 chunks x 8 blocks = 128 dispatches ran
    31.6 s when the corpus pump itself is ~12 s)."""
    def step(operand):
        q, p = operand
        return _stream_block_body(
            q, x16, aux, valid, p, base,
            metric=metric, c=c, ascending=ascending, chunk=chunk,
        )

    return jax.lax.map(step, (qs, prev))


@partial(jax.jit, static_argnames=("metric", "k", "chunk"))
def bf16_flat_topk(q: jnp.ndarray, x_bf16: jnp.ndarray, mean: jnp.ndarray,
                   valid: jnp.ndarray, *, metric: Metric, k: int, chunk: int):
    """Chunked approximate top-k over the CENTERED bf16 corpus copy for the
    L1 family (elementwise lanes upcast per chunk in-register, adding the
    mean back — more precise than rounding the raw rows to bf16 would be).
    The matmul family uses :func:`bf16_pass_ids` instead."""
    n_pad = x_bf16.shape[0]
    ascending = metric.ascending

    def score_block(xb):
        if metric in (Metric.IP, Metric.L2, Metric.COSINE):
            xf0 = xb.astype(jnp.float32)
            aux = {
                "mean": mean,
                "xm": xf0 @ mean,
                "xc_sq": jnp.sum(xf0 * xf0, axis=-1),
                "xsq_true": jnp.sum((xf0 + mean[None, :]) ** 2, axis=-1),
            }
            return _bf16_scores(q, xb, aux, metric)
        xf = xb.astype(jnp.float32) + mean[None, :]
        diff = jnp.abs(q[:, None, :] - xf[None, :, :])
        if metric is Metric.L1:
            return jnp.sum(diff, axis=-1)
        if metric is Metric.CHEBYSHEV:
            return jnp.max(diff, axis=-1)
        if metric is Metric.CANBERRA:
            den = jnp.abs(q[:, None, :]) + jnp.abs(xf[None, :, :])
            return jnp.sum(jnp.where(den == 0.0, 0.0, diff / jnp.maximum(den, 1e-45)), axis=-1)
        # bray-curtis
        num = jnp.sum(diff, axis=-1)
        den = jnp.sum(jnp.abs(q[:, None, :] + xf[None, :, :]), axis=-1)
        return jnp.where(den == 0.0, jnp.where(num == 0.0, 0.0, jnp.inf),
                         num / jnp.maximum(den, 1e-45))

    n_chunks = n_pad // chunk
    if n_chunks <= 1:
        return masked_top_c(score_block(x_bf16), min(k, n_pad), ascending, valid)
    n_main = n_chunks * chunk
    kc = min(k, chunk)

    def body(operand):
        xb, v, base = operand
        d, i = masked_top_c(score_block(xb), kc, ascending, v)
        return d, (i + base[0]).astype(jnp.int32)

    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[:, None]
    dists, ids = jax.lax.map(
        body,
        (x_bf16[:n_main].reshape(n_chunks, chunk, -1),
         valid[:n_main].reshape(n_chunks, chunk), bases),
    )
    b = dists.shape[1]
    dists = jnp.moveaxis(dists, 0, 1).reshape(b, n_chunks * kc)
    ids = jnp.moveaxis(ids, 0, 1).reshape(b, n_chunks * kc)
    if n_main < n_pad:
        d_t, i_t = masked_top_c(score_block(x_bf16[n_main:]), min(k, n_pad - n_main),
                                ascending, valid[n_main:])
        dists = jnp.concatenate([dists, d_t], axis=1)
        ids = jnp.concatenate([ids, (i_t + n_main).astype(jnp.int32)], axis=1)
    return merge_top_k(dists, ids, min(k, n_pad), ascending)


@partial(jax.jit, static_argnames=("metric",))
def rescore_rows(q: jnp.ndarray, rows: jnp.ndarray, row_valid: jnp.ndarray, *, metric: Metric):
    """Exact distances from each query (B, D) to an explicit candidate row
    block (B, C, D) — the device rescore step behind quantized/ANN
    shortlists (reference: src/storage/vector_store.rs:611)."""

    def one(q_row, rows_b, valid_b):
        qt = D.query_transform(q_row[None], metric)
        ct = D.corpus_transform(rows_b, metric)
        scores = D.pairwise(qt, ct, metric)[0]
        return jnp.where(valid_b, scores, jnp.nan)

    return jax.vmap(one)(q, rows, row_valid)


# ── host-side exact rescore (the second pass of the default search) ──────


def host_exact_scores(q: np.ndarray, rows: np.ndarray, metric: Metric) -> np.ndarray:
    """Exact f32 scores for (B, C, D) candidate rows against (B, D) queries,
    computed on the host mirror — no device round trip."""
    q = q.astype(np.float32)
    rows = rows.astype(np.float32)
    ip = np.einsum("bcd,bd->bc", rows, q)
    if metric is Metric.IP:
        return ip
    q_sq = np.sum(q * q, axis=-1, keepdims=True)
    r_sq = np.sum(rows * rows, axis=-1)
    if metric is Metric.L2:
        return np.maximum(q_sq + r_sq - 2.0 * ip, 0.0)
    if metric is Metric.COSINE:
        denom = np.sqrt(q_sq * r_sq)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = 1.0 - ip / np.maximum(denom, 1e-30)
        return np.where(denom < 1e-30, 1.0, out).astype(np.float32)
    raise ValueError(f"host rescore does not support {metric}")


class FilterHandle:
    """A resolved row filter: host mask + count, with lazily-staged device
    artifacts (mask or gather indices) cached per corpus epoch. Collections
    cache these per where-string so repeated filtered queries pay zero
    re-upload (reference keeps the equivalent BitSet per query instead)."""

    __slots__ = ("mask", "count", "indices", "_epoch", "_dev_mask", "_dev_idx",
                 "_dev_idx_valid", "_s_pad")

    def __init__(self, mask: np.ndarray):
        self.mask = np.asarray(mask, dtype=bool)
        self.count = int(self.mask.sum())
        self.indices: Optional[np.ndarray] = None
        self._epoch = -1
        self._dev_mask = None
        self._dev_idx = None
        self._dev_idx_valid = None
        self._s_pad = 0

    def use_gather(self, total_rows: int) -> bool:
        """Reference policy engine.rs:95-102: exact compact scan when the
        subset is small absolutely and relatively."""
        return 0 < self.count <= GATHER_MAX_ROWS and self.count * 4 <= max(total_rows, 1)

    def device_mask(self, n_pad: int, epoch: int, sharding=None):
        if self._dev_mask is None or self._epoch != epoch:
            full = np.zeros(n_pad, dtype=bool)
            m = min(len(self.mask), n_pad)
            full[:m] = self.mask[:m]
            self._dev_mask = _put(full, sharding)
            self._epoch = epoch
            self._dev_idx = None
        return self._dev_mask

    def device_indices(self, n_rows: int, epoch: int, sharding=None):
        """(idx (S_pad,), idx_valid (S_pad,)) device arrays; S_pad rounded
        up so compile shapes stay bounded."""
        if self._dev_idx is None or self._epoch != epoch:
            if self.indices is None or self._epoch != epoch:
                self.indices = np.nonzero(self.mask[:n_rows])[0].astype(np.int32)
            s = len(self.indices)
            s_pad = max(_round_up(s, 2048), 2048)
            idx = np.zeros(s_pad, dtype=np.int32)
            idx[:s] = self.indices
            iv = np.zeros(s_pad, dtype=bool)
            iv[:s] = True
            self._dev_idx = _put(idx, sharding)
            self._dev_idx_valid = _put(iv, sharding)
            self._s_pad = s_pad
            self._epoch = epoch
            self._dev_mask = None
        return self._dev_idx, self._dev_idx_valid


def _put(arr: np.ndarray, sharding=None):
    """Stage a host array on device, optionally with an explicit sharding."""
    if sharding is None:
        return jnp.asarray(arr)
    return jax.device_put(arr, sharding)


class DeviceCorpus:
    """HBM-resident, padded, growable corpus for one vector field.

    Mirrors the role of the reference's FlatMmap (src/storage/flat_mmap.rs:89)
    but TPU-shaped: the scan array is bfloat16 in HBM; exact f32 rows live in
    a host mirror used for the rescore pass (and for staging the lazy f32
    device copy that the exact/elementwise-metric paths use). Capacity grows
    geometrically so recompiles happen only at O(log n) distinct shapes.
    """

    APPROX_MIN_ROWS = 65_536  # approx engage threshold (approx_search.rs:49)

    def __init__(self, dim: int, dtype: str = "float32", mesh=None):
        """``mesh``: a jax Mesh with a "corpus" axis — rows shard across it
        and XLA SPMD inserts the cross-chip top-k merge collectives (this is
        the engine-integrated face of the multi-chip data plane; the
        explicit shard_map formulation lives in parallel/mesh.py). Defaults
        to the process-wide mesh set via parallel.mesh.set_default_mesh."""
        from ..parallel.mesh import get_default_mesh

        self.dim = int(dim)
        self.dtype = dtype
        self.mesh = mesh if mesh is not None else get_default_mesh()
        self.n = 0
        self.capacity = 0
        self.epoch = 0
        self._host = np.zeros((0, self.dim), dtype=np.float32)  # exact mirror
        self._dev16: Optional[jnp.ndarray] = None  # (cap, dim) bf16 scan array
        self._dev32: Optional[jnp.ndarray] = None  # lazy (cap, dim) f32
        self._tombs_np = np.zeros(0, dtype=bool)
        self._tombs: Optional[jnp.ndarray] = None  # (cap,) bool, True = deleted
        self._sq: Optional[jnp.ndarray] = None  # (cap,) f32 centered-row norms
        self._sq_host: Optional[np.ndarray] = None  # host copy of the same
        # centering state: the bf16 scan copy stores x - mean so rounding is
        # spent on the discriminative component (see _bf16_scores); rankings
        # are restored via the per-row xm = mean.(x-mean) correction
        self._mean_np: Optional[np.ndarray] = None  # (D,) f32
        self._xm_host: Optional[np.ndarray] = None  # (cap,) f32
        self._xsqtrue_host: Optional[np.ndarray] = None  # (cap,) f32 true norms
        self._aux: Optional[dict] = None  # device aux cache (mean/xm/xc_sq/xsq_true)
        self._host16: Optional[np.ndarray] = None  # streaming-mode bf16 mirror
        self.streaming = False  # bf16 corpus > HBM budget: blockwise scan
        self._valid_base: Optional[jnp.ndarray] = None
        self._transforms: dict[Metric, dict] = {}
        self._dirty = True
        self._dirty_lo = 0
        # rows scored by the most recent search dispatch (QueryProfile's
        # scanned_vectors, reference engine.rs:6906)
        self.last_scanned = 0

    # ── mesh sharding helpers ────────────────────────────────────────────

    def _rows_sharding(self, ndim: int = 2):
        if self.mesh is None:
            return None
        from ..parallel.mesh import corpus_sharding

        return corpus_sharding(self.mesh, ndim)

    def _repl_sharding(self):
        if self.mesh is None:
            return None
        from ..parallel.mesh import replicated

        return replicated(self.mesh)

    def _row_align(self) -> int:
        if self.mesh is None:
            return ROW_BLOCK
        return ROW_BLOCK * int(self.mesh.shape["corpus"])

    def _cap_for(self, n: int) -> int:
        """Bucketed capacity: round up to the row alignment, then to one of
        ~8 sub-steps per power-of-two octave — bounds the number of distinct
        compiled scan shapes without geometric slack."""
        align = self._row_align()
        need = _round_up(max(n, 1), align)
        if need <= align * 8:
            return need
        octave = 1 << (need.bit_length() - 1)
        step = max(octave // 8, align)
        return _round_up(need, step)

    def would_stream(self) -> bool:
        """True if (re)staging at the current row count would enter
        streaming (>HBM) mode — WITHOUT staging anything. `streaming` is
        only assigned during staging, so write-path guards that run before
        the first post-commit search must ask this instead."""
        if not self._dirty:
            return self.streaming
        return self.mesh is None and self._cap_for(self.n) * self.dim * 2 > HBM_BYTES

    def _ensure_staged(self) -> None:
        """Stage (or refresh) the device scan array from the host mirror.

        Appends/overwrites touch only the host mirror; the bf16 HBM array is
        built here on demand. Small contiguous tails update in place; larger
        changes (or capacity changes) restage fully — dropping the old
        buffer FIRST so peak HBM never doubles (a 20M x 128 corpus is 5.1 GB
        bf16; transiently holding two copies was how the old geometric-growth
        path ran a 16 GB chip out of memory)."""
        if not self._dirty or self.n == 0:
            return
        cap = self._cap_for(self.n)
        stream = self.mesh is None and cap * self.dim * 2 > HBM_BYTES
        if stream:
            self._stage_streaming(cap)
            return
        if self.streaming:  # shrank back under the budget (compaction)
            self.streaming = False
            self._host16 = None
        incremental = (
            self._dev16 is not None
            and cap == self.capacity
            and self.mesh is None
            and self._mean_np is not None
            and (self.n - self._dirty_lo) * 2 <= self.n
        )
        if incremental:
            lo = self._dirty_lo
            tail16, sq, xm, xsqt = self._convert_block(lo, self.n)
            self._sq_host[lo : self.n] = sq
            self._xm_host[lo : self.n] = xm
            self._xsqtrue_host[lo : self.n] = xsqt
            rows16 = jnp.asarray(tail16)
            self._dev16 = jax.lax.dynamic_update_slice(self._dev16, rows16, (lo, 0))
            self._aux = None  # host aux changed; restage lazily
            if self._dev32 is not None:
                self._dev32 = jax.lax.dynamic_update_slice(
                    self._dev32, jnp.asarray(self._host[lo : self.n]), (lo, 0)
                )
        else:
            self._dev16 = None  # free before reallocating
            self._dev32 = None
            self._aux = None
            self._compute_mean()
            full16 = _alloc_rows(cap, self.dim, ml_dtypes.bfloat16)
            # fold the aux computations into the conversion sweep: one host
            # pass, and the first search skips a whole device compile
            self._sq_host = np.zeros(cap, dtype=np.float32)
            self._xm_host = np.zeros(cap, dtype=np.float32)
            self._xsqtrue_host = np.zeros(cap, dtype=np.float32)
            for lo in range(0, self.n, 16 * ROW_BLOCK):
                hi = min(lo + 16 * ROW_BLOCK, self.n)
                block16, sq, xm, xsqt = self._convert_block(lo, hi)
                full16[lo:hi] = block16
                self._sq_host[lo:hi] = sq
                self._xm_host[lo:hi] = xm
                self._xsqtrue_host[lo:hi] = xsqt
            self._dev16 = _put(full16, self._rows_sharding())
            self.capacity = cap
        self._stage_tombs()
        self._dirty = False
        self._dirty_lo = self.n

    def _compute_mean(self) -> None:
        """Column mean over the live rows (one chunked pass)."""
        acc = np.zeros(self.dim, dtype=np.float64)
        for lo in range(0, self.n, 16 * ROW_BLOCK):
            hi = min(lo + 16 * ROW_BLOCK, self.n)
            acc += self._host[lo:hi].sum(axis=0, dtype=np.float64)
        self._mean_np = (acc / max(self.n, 1)).astype(np.float32)

    def _convert_block(self, lo: int, hi: int):
        """Center + convert rows [lo, hi): returns (bf16 block, centered-row
        norms, xm = mean.(x-mean), true row norms) — all f32 aux."""
        m = self._mean_np
        xc = self._host[lo:hi] - m[None, :]
        block16 = xc.astype(ml_dtypes.bfloat16)
        xc32 = block16.astype(np.float32)
        sq = (xc32**2).sum(axis=1)
        xm = xc32 @ m
        xsqt = (np.asarray(self._host[lo:hi], dtype=np.float32) ** 2).sum(axis=1)
        return block16, sq, xm, xsqt

    def _stage_streaming(self, cap: int) -> None:
        """Streaming mode: no resident device array. The bf16 copy lives in
        a host mirror (RAM or memmap via _alloc_rows) and searches pump
        fixed-shape blocks through HBM with a carried top-C state."""
        incremental = (
            self.streaming
            and self._host16 is not None
            and cap == self.capacity
            and self._mean_np is not None
            and (self.n - self._dirty_lo) * 2 <= self.n
        )
        self._dev16 = None
        self._dev32 = None
        self._tombs = None
        self._aux = None
        if incremental:
            lo = self._dirty_lo
            tail16, sq, xm, xsqt = self._convert_block(lo, self.n)
            self._host16[lo : self.n] = tail16
            self._sq_host[lo : self.n] = sq
            self._xm_host[lo : self.n] = xm
            self._xsqtrue_host[lo : self.n] = xsqt
        else:
            self._compute_mean()
            host16 = _alloc_rows(cap, self.dim, ml_dtypes.bfloat16)
            self._sq_host = np.zeros(cap, dtype=np.float32)
            self._xm_host = np.zeros(cap, dtype=np.float32)
            self._xsqtrue_host = np.zeros(cap, dtype=np.float32)
            for lo in range(0, self.n, 16 * ROW_BLOCK):
                hi = min(lo + 16 * ROW_BLOCK, self.n)
                block16, sq, xm, xsqt = self._convert_block(lo, hi)
                host16[lo:hi] = block16
                self._sq_host[lo:hi] = sq
                self._xm_host[lo:hi] = xm
                self._xsqtrue_host[lo:hi] = xsqt
            self._host16 = host16
            self.capacity = cap
        self.streaming = True
        self._dirty = False
        self._dirty_lo = self.n

    # ── data management ──────────────────────────────────────────────────

    def _invalidate(self) -> None:
        self.epoch += 1
        self._sq = None
        self._valid_base = None
        self._transforms.clear()

    def _stage_tombs(self) -> None:
        full = np.zeros(self.capacity, dtype=bool)
        m = min(len(self._tombs_np), self.capacity)
        full[:m] = self._tombs_np[:m]
        self._tombs = _put(full, self._rows_sharding(1))

    def append(self, rows: np.ndarray) -> None:
        rows = np.ascontiguousarray(rows, dtype=np.float32)
        if rows.ndim != 2 or rows.shape[1] != self.dim:
            raise ValueError(f"expected (*, {self.dim}) rows, got {rows.shape}")
        m = rows.shape[0]
        if m == 0:
            return
        if self.n + m > len(self._host):
            new_len = max(ROW_BLOCK, len(self._host))
            while new_len < self.n + m:
                new_len *= 2
            host = _alloc_rows(new_len, self.dim, np.float32)
            for lo in range(0, self.n, 4 * ROW_BLOCK):
                hi = min(lo + 4 * ROW_BLOCK, self.n)
                host[lo:hi] = self._host[lo:hi]
            self._host = host
        self._host[self.n : self.n + m] = rows
        self._dirty_lo = min(self._dirty_lo, self.n)
        self._dirty = True
        self.n += m
        self._invalidate()

    def _overwrite_aux(self, ids: np.ndarray, rows: np.ndarray):
        """Centered bf16 rows + refreshed host aux for overwritten rows."""
        m = self._mean_np
        xc16 = (rows - m[None, :]).astype(ml_dtypes.bfloat16)
        xc32 = xc16.astype(np.float32)
        self._sq_host[ids] = (xc32**2).sum(axis=1)
        self._xm_host[ids] = xc32 @ m
        self._xsqtrue_host[ids] = (rows**2).sum(axis=1)
        self._aux = None
        return xc16

    def overwrite(self, row_ids: np.ndarray, rows: np.ndarray) -> None:
        """Positional overwrite (upsert path). Overwritten rows center with
        the existing mean (any fixed mean preserves rankings)."""
        rows = np.ascontiguousarray(rows, dtype=np.float32)
        ids = np.asarray(row_ids, dtype=np.int32)
        self._host[ids] = rows
        if self.streaming and not self._dirty and self._mean_np is not None:
            self._host16[ids] = self._overwrite_aux(ids, rows)
        elif (self._dev16 is not None and not self._dirty and self.mesh is None
              and self._mean_np is not None):
            xc16 = self._overwrite_aux(ids, rows)
            idx = jnp.asarray(ids)
            self._dev16 = self._dev16.at[idx].set(jnp.asarray(xc16))
            if self._dev32 is not None:
                self._dev32 = self._dev32.at[idx].set(jnp.asarray(rows))
        else:
            self._dirty_lo = 0  # scattered rows: full restage
            self._dirty = True
        self._invalidate()

    def set_tombstones(self, tombs: np.ndarray) -> None:
        """Replace the tombstone mask from the host bitset (first n rows)."""
        self._tombs_np = np.asarray(tombs, dtype=bool)
        if self.capacity and not self._dirty:
            self._stage_tombs()
        self._valid_base = None
        self.epoch += 1

    def finalize(self) -> None:
        """Stage pending changes and trim growth slack (called at commit
        boundaries) so the first post-commit search pays no staging."""
        if self.n and self.capacity != self._cap_for(self.n):
            self._dirty = True  # capacity change forces a full restage
        self._ensure_staged()

    def reset(self) -> None:
        self.n = 0
        self.capacity = 0
        self._host = np.zeros((0, self.dim), dtype=np.float32)
        self._dev16 = None
        self._dev32 = None
        self._tombs_np = np.zeros(0, dtype=bool)
        self._tombs = None
        self._sq_host = None
        self._mean_np = None
        self._xm_host = None
        self._xsqtrue_host = None
        self._aux = None
        self._host16 = None
        self.streaming = False
        self._dirty = True
        self._dirty_lo = 0
        self._invalidate()

    # ── derived state ────────────────────────────────────────────────────

    @property
    def n_pad(self) -> int:
        self._ensure_staged()
        return self.capacity

    @property
    def _data(self) -> jnp.ndarray:
        """Lazily-staged f32 device copy (exact one-pass scans, elementwise
        metrics, graph/quantizer index builds gather from this)."""
        self._ensure_staged()
        if self.streaming:
            raise ValueError(
                "corpus bf16 footprint exceeds the device HBM budget "
                "(LYNSE_TPU_HBM_BYTES); the f32 device copy is unavailable in "
                "streaming mode — searches use the blockwise streaming scan"
            )
        if self._dev32 is None:
            if self.capacity == 0:
                raise ValueError("empty corpus")
            full = np.zeros((self.capacity, self.dim), dtype=np.float32)
            full[: self.n] = self._host[: self.n]
            self._dev32 = _put(full, self._rows_sharding())
        return self._dev32

    def host_rows(self, row_ids: np.ndarray) -> np.ndarray:
        """Exact f32 rows from the host mirror (no device traffic)."""
        return self._host[np.asarray(row_ids, dtype=np.int64)]

    @property
    def data16(self) -> jnp.ndarray:
        """The staged mean-centered bf16 scan array (cap, D). Graph beams
        gather guidance rows from this (with the bf16_aux rank-1
        corrections) instead of forcing the 2x-HBM f32 copy."""
        self._ensure_staged()
        if self.streaming or self._dev16 is None:
            raise ValueError("bf16 device array unavailable (streaming or empty corpus)")
        return self._dev16

    def host_sq_norms(self) -> np.ndarray:
        """True squared row norms (n,) from the staging aux — free after the
        first staging pass. Used by the graph indexes' IP entry scans to pin
        the top-norm band into the sampled entry set (MIPS winners
        concentrate at high norms)."""
        self._ensure_staged()
        return self._xsqtrue_host[: self.n]

    def bf16_aux(self) -> dict:
        """Device aux arrays for the centered bf16 proxies: mean (D,),
        xm (cap,), xc_sq (cap,), xsq_true (cap,) — see _bf16_scores."""
        self._ensure_staged()
        if self._aux is None:
            rs = self._rows_sharding(1)
            self._aux = {
                "mean": _put(self._mean_np, self._repl_sharding()),
                "xm": _put(self._xm_host, rs),
                "xc_sq": _put(self._sq_host, rs),
                "xsq_true": _put(self._xsqtrue_host, rs),
            }
        return self._aux

    def transform(self, metric: Metric) -> dict:
        ct = self._transforms.get(metric)
        if ct is None:
            data = self._data.astype(jnp.float32)
            ct = jax.jit(D.corpus_transform, static_argnames=("metric",))(data, metric)
            self._transforms[metric] = ct
        return ct

    def valid_mask(self, filter_mask: Optional[np.ndarray] = None) -> jnp.ndarray:
        self._ensure_staged()
        base = self._valid_base
        if base is None:
            n_pad = self.n_pad
            host_valid = np.zeros(n_pad, dtype=bool)
            host_valid[: self.n] = True
            m = min(len(self._tombs_np), self.n)
            host_valid[:m] &= ~self._tombs_np[:m]
            base = _put(host_valid, self._rows_sharding(1))
            self._valid_base = base
        if filter_mask is not None:
            handle = filter_mask if isinstance(filter_mask, FilterHandle) else FilterHandle(filter_mask)
            base = base & handle.device_mask(self.n_pad, self.epoch, self._rows_sharding(1))
        return base

    def rows(self, row_ids: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(self.host_rows(row_ids))

    # ── search entry points ──────────────────────────────────────────────

    def _device_rescore_ok(self, metric: Metric) -> bool:
        """True when the exact second pass runs fused on device (fetch only
        the packed (B, 3k) result): needs the f32 copy resident alongside
        the bf16 array — 6 B/element within the HBM budget — and the
        single-chip plane (the mesh plane's shortlist merges host-side).
        Call after _ensure_staged (uses the staged capacity)."""
        return (
            DEVICE_RESCORE
            and not self.streaming
            and self.mesh is None
            and metric in TWO_PASS_METRICS
            and self.capacity * self.dim * 6 <= HBM_BYTES
        )

    def _shortlist_size(self, k: int, limit: int, oversample: int = 4) -> int:
        c = max(64, oversample * k) if k <= 64 else (
            2 * k if k <= 512 else int(1.25 * k))
        c = max(c, k)
        # scale the cushion with corpus size: when scores concentrate (e.g.
        # uniform data, where IP spread is comparable to bf16 rounding) the
        # proxy ranking is noisy within a band of near-ties, and a fixed-64
        # shortlist drops true top-k rows at 1M scale (measured recall@10
        # 0.995 vs the 0.999 exact-flat floor); ~0.025% of the corpus keeps
        # the fetch and the exact rescore negligible
        c = max(c, min(1024, limit // 4096))
        return min(_round_up(c, 64), max(limit, 1))

    def search_submit(
        self,
        queries: np.ndarray,
        k: int,
        metric: Metric,
        filter_mask=None,
        mode: str = "auto",
        oversample: int = 4,
    ) -> Callable[[], tuple[np.ndarray, np.ndarray]]:
        """Dispatch a search asynchronously; returns a zero-arg resolver
        performing the (single) host sync + exact rescore. This is the
        pipelining primitive behind search_stream.

        Batches are padded to a BATCH_BUCKETS size so the whole [1, 256]
        range shares three compiled executables (see _batch_bucket)."""
        q = np.ascontiguousarray(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        b = q.shape[0]
        bucket = _batch_bucket(b)
        if bucket != b:
            # keep the padded batch within the score-matrix budget so
            # bucketing never triggers the oversized-batch split below
            max_b = max(1, SINGLE_SHOT_BUDGET // max(self.n_pad, 1)) if self.n else bucket
            bucket = min(bucket, max(max_b, b))
        if bucket != b:
            qp = np.concatenate([q, np.zeros((bucket - b, q.shape[1]), q.dtype)])
            inner = self._submit_impl(qp, k, metric, filter_mask, mode, oversample)
            return lambda: tuple(a[:b] for a in inner())
        return self._submit_impl(q, k, metric, filter_mask, mode, oversample)

    def _submit_impl(
        self,
        q: np.ndarray,
        k: int,
        metric: Metric,
        filter_mask=None,
        mode: str = "auto",
        oversample: int = 4,
    ) -> Callable[[], tuple[np.ndarray, np.ndarray]]:
        b = q.shape[0]
        if self.n == 0:
            empty = (np.zeros((b, 0), dtype=np.float32), np.zeros((b, 0), dtype=np.int64))
            return lambda: empty

        handle = None
        if filter_mask is not None:
            handle = filter_mask if isinstance(filter_mask, FilterHandle) else FilterHandle(filter_mask)
            if handle.count == 0:
                empty = (np.zeros((b, 0), dtype=np.float32), np.zeros((b, 0), dtype=np.int64))
                return lambda: empty

        self._ensure_staged()
        if self.streaming:
            # blockwise streaming scan (final distances stay exact via the
            # rescore pass, so mode="exact" routes here too)
            return self._stream_scan_submit(q, k, metric, handle, oversample)

        two_pass = (
            mode != "exact"
            and metric in TWO_PASS_METRICS
            and self.n >= TWO_PASS_MIN_ROWS
        )
        if not two_pass:
            return self._exact_submit(q, k, metric, handle)

        # keep the (B, N) first-pass score block within the HBM budget by
        # splitting oversized query batches host-side; parts use the largest
        # batch bucket that fits so every part reuses a bucketed executable
        # and the parts' dispatch chains overlap (all are submitted before
        # any is resolved)
        max_b = max(1, SINGLE_SHOT_BUDGET // max(self.n_pad, 1))
        if b > max_b:
            step = max([s for s in BATCH_BUCKETS if s <= max_b], default=max_b)
            resolvers = [
                self.search_submit(q[s : s + step], k, metric, filter_mask,
                                   mode=mode, oversample=oversample)
                for s in range(0, b, step)
            ]

            def resolve_parts():
                parts = [r() for r in resolvers]
                width = max(p[0].shape[1] for p in parts)

                def padto(a, fill):
                    if a.shape[1] == width:
                        return a
                    pad = np.full((a.shape[0], width - a.shape[1]), fill, a.dtype)
                    return np.concatenate([a, pad], axis=1)

                return (
                    np.concatenate([padto(p[0], 0.0) for p in parts], axis=0),
                    np.concatenate([padto(p[1], -1) for p in parts], axis=0),
                )

            return resolve_parts

        self._ensure_staged()
        qd = _put(q, self._repl_sharding())
        ascending = metric.ascending
        if handle is not None and handle.use_gather(self.n):
            c = self._shortlist_size(k, handle.count, oversample)
            self.last_scanned = handle.count + c
            idx, idx_valid = handle.device_indices(self.n, self.epoch, self._rows_sharding(1))
            if self._device_rescore_ok(metric):
                out = bf16_gather_exact_pass_packed(
                    qd, self._dev16, idx, idx_valid, self.bf16_aux(),
                    self.valid_mask(), self._data,
                    metric=metric, k=k, c=c, ascending=ascending,
                )
                _kick_d2h(out)
                kk = min(k, c)
                return lambda: decode_packed(np.asarray(out), kk, metric)
            out = bf16_gather_pass_ids(
                qd, self._dev16, idx, idx_valid, self.bf16_aux(),
                self.valid_mask(), metric=metric, k=c, ascending=ascending,
            )
            _kick_d2h(out)
            subset = handle.indices

            def resolve_gather():
                local = np.asarray(out).astype(np.int64)
                keep = local >= 0
                local = np.clip(local, 0, len(subset) - 1)
                ids = subset[local].astype(np.int64)
                return self._rescore_topk(q, ids, keep, metric, k)

            return resolve_gather

        c = self._shortlist_size(k, self.n, oversample)
        self.last_scanned = self.n + c  # full first pass + exact rescore rows
        valid = self.valid_mask(handle)
        if self._device_rescore_ok(metric):
            out = bf16_exact_pass_packed(
                qd, self._dev16, self.bf16_aux(), self._data, valid,
                metric=metric, k=k, c=c, ascending=ascending,
            )
            _kick_d2h(out)
            kk = min(k, c)
            return lambda: decode_packed(np.asarray(out), kk, metric)
        out = bf16_pass_ids(
            qd, self._dev16, self.bf16_aux(), valid,
            metric=metric, k=c, ascending=ascending,
        )
        _kick_d2h(out)

        def resolve():
            ids = np.asarray(out).astype(np.int64)
            return self._rescore_topk(q, ids, ids >= 0, metric, k)

        return resolve

    def stream_supported(self, metric: Metric, handle) -> bool:
        """True when the prestaged-block streaming fast path applies."""
        self._ensure_staged()
        return (
            not self.streaming
            and metric in TWO_PASS_METRICS
            and self.n >= TWO_PASS_MIN_ROWS
            and (handle is None or (handle.count > 0 and not handle.use_gather(self.n)))
        )

    def stream_stage_queries(self, q: np.ndarray):
        """One H2D for a whole query stream (pad handled by caller)."""
        return _put(np.ascontiguousarray(q, dtype=np.float32), self._repl_sharding())

    def stream_submit(self, qblock_dev, start: int, window: int, k: int,
                      metric: Metric, handle=None, oversample: int = 4):
        """Two-pass window over a prestaged query block: device-side slice,
        fused bf16 first pass, resolver does the exact host rescore."""
        self._ensure_staged()
        c = self._shortlist_size(k, self.n, oversample)
        valid = self.valid_mask(handle)
        if self._device_rescore_ok(metric):
            out = bf16_exact_pass_packed_window(
                qblock_dev, jnp.int32(start), self._dev16, self.bf16_aux(),
                self._data, valid,
                metric=metric, k=k, c=c, ascending=metric.ascending,
                window=window,
            )
            _kick_d2h(out)
            kk = min(k, c)
            return lambda q_rows: decode_packed(np.asarray(out), kk, metric)
        out = bf16_pass_ids_window(
            qblock_dev, jnp.int32(start), self._dev16, self.bf16_aux(), valid,
            metric=metric, k=c, ascending=metric.ascending, window=window,
        )
        _kick_d2h(out)

        def resolve(q_rows: np.ndarray):
            ids = np.asarray(out).astype(np.int64)
            return self._rescore_topk(q_rows, ids, ids >= 0, metric, k)

        return resolve

    def _stream_block_rows(self, b: int) -> int:
        by_bytes = STREAM_BLOCK_BYTES // (self.dim * 2)
        # honor the HBM budget: two block buffers may be in flight (≤ 1/4
        # each) and the (b, block) f32 score scratch gets the other half
        by_hbm = (HBM_BYTES // 4) // (self.dim * 2)
        by_scratch = (HBM_BYTES // 2) // (4 * max(b, 1))
        by_budget = SINGLE_SHOT_BUDGET // max(b, 1)
        rows = min(by_bytes, by_hbm, by_scratch, by_budget)
        return max(ROW_BLOCK, (rows // ROW_BLOCK) * ROW_BLOCK)

    def _stream_scan_submit(self, q: np.ndarray, k: int, metric: Metric,
                            handle, oversample: int = 4):
        """Blockwise >HBM scan: pump bf16 blocks from the host mirror through
        the device, carrying a packed top-C state across block dispatches —
        H2D of block i+1 overlaps the scan of block i (async dispatch), and
        the whole pass costs one host sync + one exact rescore. A tiny fetch
        every other block bounds in-flight HBM to ~2 block buffers."""
        ascending = metric.ascending
        b = q.shape[0]

        # selective filters: exact compact scan straight off the host mirror
        if (handle is not None and handle.use_gather(self.n)
                and metric in TWO_PASS_METRICS):
            if handle.indices is None:
                handle.indices = np.nonzero(handle.mask[: self.n])[0].astype(np.int32)
            idx = handle.indices
            self.last_scanned = len(idx)

            def resolve_gather():
                sub = self._host[idx]  # (S, D)
                ip = q.astype(np.float32) @ sub.T.astype(np.float32)
                if metric is Metric.IP:
                    exact = ip
                elif metric is Metric.L2:
                    q_sq = (q * q).sum(-1, keepdims=True)
                    s_sq = (sub.astype(np.float32) ** 2).sum(-1)
                    exact = np.maximum(q_sq + s_sq[None, :] - 2.0 * ip, 0.0)
                else:
                    q_sq = (q * q).sum(-1, keepdims=True)
                    s_sq = (sub.astype(np.float32) ** 2).sum(-1)
                    denom = np.sqrt(q_sq * s_sq[None, :])
                    with np.errstate(invalid="ignore", divide="ignore"):
                        exact = np.where(denom < 1e-30, 1.0,
                                         1.0 - ip / np.maximum(denom, 1e-30))
                # drop tombstoned rows inside the subset
                if len(self._tombs_np):
                    tz = self._tombs_np[idx[idx < len(self._tombs_np)]]
                    dead = np.zeros(len(idx), dtype=bool)
                    dead[: len(tz)] = tz
                    exact = np.where(dead[None, :], np.nan, exact)
                keyed = np.where(np.isnan(exact), -np.inf,
                                 -exact if ascending else exact)
                order = np.argsort(-keyed, axis=1, kind="stable")[:, :k]
                d = np.take_along_axis(exact, order, axis=1).astype(np.float32)
                i = idx[order].astype(np.int64)
                kept = np.isfinite(np.take_along_axis(keyed, order, axis=1))
                return _trim_results(d, i, kept, k)

            return resolve_gather

        c = self._shortlist_size(k, self.n, oversample)
        self.last_scanned = self.n + c
        # Fixed query-chunk shape: every chunk reuses ONE compiled executable
        # and — the whole point of this structure — every chunk scans the
        # SAME staged block, so the corpus is pumped over the transport ONCE
        # per pass no matter how many queries ride it. The pump IS the
        # streaming-mode floor (dev tunnel: ~20-47 MB/s blocked H2D (weather-dependent), 5.5-12.5 s for
        # a 1M x 128 bf16 corpus — benchmarks/dispatch_floor_r05.log h2d
        # bandwidth rows; direct-attached TPU hosts move this at PCIe/DMA
        # rates instead), and it amortizes across the whole query stream.
        qc = 16 if b <= 16 else 64
        n_chunks = (b + qc - 1) // qc
        q_pad = q
        if n_chunks * qc != b:
            q_pad = np.concatenate(
                [q, np.zeros((n_chunks * qc - b, q.shape[1]), q.dtype)])
        block_rows = self._stream_block_rows(qc)
        chunk = min(ELEMWISE_CHUNK, block_rows)
        qs = jnp.asarray(q_pad.reshape(n_chunks, qc, q.shape[1]))
        fill = np.inf if ascending else -np.inf
        init = np.concatenate([
            np.full((qc, c), fill, np.float32),
            np.full((qc, c), -1.0, np.float32),   # id hi of -1
            np.full((qc, c), 4095.0, np.float32),  # id lo of -1
        ], axis=1)
        state = jnp.asarray(np.broadcast_to(init, (n_chunks,) + init.shape))
        mean_d = jnp.asarray(self._mean_np)
        mask = handle.mask if handle is not None else None
        block_bytes = block_rows * self.dim * 2
        # backpressure: a tiny D2H sync costs a transport round trip (~33 ms,
        # benchmarks/dispatch_floor_r05.log) but bounds in-flight block
        # buffers; two blocks in flight keeps H2D(i+1) overlapping scan(i)
        # while honoring the HBM budget
        inflight_limit = min(STREAM_INFLIGHT_BYTES, max(2 * block_bytes, HBM_BYTES // 2))
        inflight = 0
        for lo in range(0, self.capacity, block_rows):
            hi = min(lo + block_rows, self.capacity)
            vb = np.zeros(block_rows, dtype=bool)
            live = min(self.n, hi) - lo
            if live > 0:
                vb[:live] = True
                t_hi = min(len(self._tombs_np), hi)
                if t_hi > lo:
                    vb[: t_hi - lo] &= ~self._tombs_np[lo:t_hi]
                if mask is not None:
                    m_hi = min(len(mask), hi)
                    if m_hi > lo:
                        vb[: m_hi - lo] &= mask[lo:m_hi]
                    if m_hi < hi:
                        vb[max(m_hi - lo, 0) : hi - lo] = False
            x16 = self._host16[lo:hi]
            xm = self._xm_host[lo:hi]
            xc_sq = self._sq_host[lo:hi]
            xsq_true = self._xsqtrue_host[lo:hi]
            if hi - lo < block_rows:  # pad the tail block: ONE compiled shape
                pad = block_rows - (hi - lo)
                x16 = np.concatenate([x16, np.zeros((pad, self.dim), x16.dtype)])
                xm = np.concatenate([xm, np.zeros(pad, np.float32)])
                xc_sq = np.concatenate([xc_sq, np.zeros(pad, np.float32)])
                xsq_true = np.concatenate([xsq_true, np.zeros(pad, np.float32)])
            blk_aux = {
                "mean": mean_d,
                "xm": jnp.asarray(xm),
                "xc_sq": jnp.asarray(xc_sq),
                "xsq_true": jnp.asarray(xsq_true),
            }
            state = stream_block_packed_multi(
                qs, jnp.asarray(x16), blk_aux, jnp.asarray(vb), state,
                jnp.int32(lo),
                metric=metric, c=c, ascending=ascending, chunk=chunk,
            )
            inflight += block_bytes
            if inflight >= inflight_limit:
                np.asarray(state[:1, :1, :1])  # backpressure sync (1 RTT)
                inflight = 0
        _kick_d2h(state)

        def resolve():
            flat = np.asarray(state).reshape(n_chunks * qc, 3 * c)
            proxy, ids = unpack_search_step(flat)
            proxy, ids = proxy[:b], ids[:b]
            keep = _keep_mask(proxy, ascending)
            return self._rescore_topk(q, ids, keep, metric, k)

        return resolve

    def _exact_submit(self, q: np.ndarray, k: int, metric: Metric, handle):
        """One-pass f32 exact scan (reference parity path)."""
        self.last_scanned = self.n  # masked scans still touch every row
        ct = self.transform(metric)
        valid = self.valid_mask(handle)
        chunk = scan_chunk_size(metric, self.n_pad, q.shape[0])
        packed = flat_search_step(
            _put(q, self._repl_sharding()), ct, valid, metric=metric, k=min(k, self.n_pad),
            chunk=chunk, ascending=metric.ascending,
        )
        _kick_d2h(packed)
        ascending = metric.ascending

        def resolve():
            return decode_packed(np.asarray(packed), k, metric)

        return resolve

    def _rescore_topk(self, q, ids, keep, metric, k):
        """Host second pass: exact f32 scores for the shortlist, stable
        (score, id) ordering, trim to k."""
        b, c = ids.shape
        safe = np.where(keep, ids, 0)
        # flat 1-D gather then reshape: numpy's 2-D fancy indexing runs ~3.5x
        # slower than the flattened equivalent on large mirrors
        rows = self._host[safe.ravel()].reshape(b, c, self.dim)
        if metric in TWO_PASS_METRICS:
            exact = host_exact_scores(q, rows, metric)
        else:  # elementwise metrics rescore on device (lanes live there)
            exact = np.asarray(rescore_rows(
                jnp.asarray(q), jnp.asarray(rows), jnp.asarray(keep), metric=metric
            ))
        key = -exact if metric.ascending else exact
        key = np.where(keep & np.isfinite(key), key, -np.inf)
        # stable best-first order with id tiebreak (matches lax.top_k's
        # lower-index-wins and the reference merge semantics)
        order = np.lexsort((safe, -key), axis=1)[:, :k]
        d = np.take_along_axis(exact, order, axis=1).astype(np.float32)
        i = np.take_along_axis(ids, order, axis=1)
        kept = np.take_along_axis(key, order, axis=1) > -np.inf
        return _trim_results(d, i, kept, k)

    def search(
        self,
        queries: np.ndarray,
        k: int,
        metric: Metric,
        filter_mask=None,
        mode: str = "auto",
    ):
        """Top-k scan: one fused device dispatch + one host fetch (+ host
        rescore on the two-pass path). Returns (dists (B,k'), row_ids
        (B,k')) trimmed of invalid entries; distances are exact f32."""
        return self.search_submit(queries, k, metric, filter_mask, mode=mode)()

    # ── approximate flat search (reference: storage/approx_search.rs) ───

    def search_approx(
        self,
        queries: np.ndarray,
        k: int,
        metric: Metric,
        eps: float = 1e-4,
        filter_mask=None,
    ):
        """Approximate two-pass scan (explicit opt-in, reference
        approx_search.rs): same bf16-first-pass machinery as the default
        matmul path with eps steering the oversample cushion; the L1 family
        runs a chunked bf16 elementwise pass + device rescore. Falls back to
        the exact scan below the engage threshold (approx_search.rs:49)."""
        if self.n <= self.APPROX_MIN_ROWS or not metric.supports_flat_approx:
            return self.search(queries, k, metric, filter_mask)
        oversample = 4 if eps >= 1e-3 else (8 if eps >= 1e-5 else 16)
        if metric in TWO_PASS_METRICS:
            return self.search_submit(
                queries, k, metric, filter_mask, mode="auto", oversample=oversample
            )()

        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        self._ensure_staged()
        if self.streaming:  # the streaming scan is already a two-pass plan
            return self.search(queries, k, metric, filter_mask)
        n_pad = self.n_pad
        handle = None
        if filter_mask is not None:
            handle = filter_mask if isinstance(filter_mask, FilterHandle) else FilterHandle(filter_mask)
        valid = self.valid_mask(handle)
        shortlist = min(max(k * oversample, k), n_pad)
        d_s, i_s = bf16_flat_topk(
            _put(q, self._repl_sharding()), self._dev16,
            self.bf16_aux()["mean"], valid,
            metric=metric, k=shortlist,
            chunk=scan_chunk_size(metric, n_pad, len(q)),
        )
        cand = np.asarray(i_s, dtype=np.int64)
        exact = self.rescore(q, cand, metric)  # (B, shortlist)
        keyed = np.where(np.isnan(exact), -np.inf, -exact if metric.ascending else exact)
        order = np.argsort(-keyed, axis=1, kind="stable")[:, :k]
        dists = np.take_along_axis(exact, order, axis=1).astype(np.float32)
        ids = np.take_along_axis(cand, order, axis=1)
        keep = np.isfinite(np.take_along_axis(keyed, order, axis=1))
        return _trim_results(dists, ids, keep, k)

    def range_search(
        self,
        query: np.ndarray,
        threshold: float,
        metric: Metric,
        max_results: int = 1000,
        filter_mask=None,
    ):
        """All rows within ``threshold`` (<= for ascending metrics, >= for
        IP), sorted best-first, capped at max_results
        (reference: engine.rs:6410 search_range)."""
        if self.n == 0:
            return np.zeros(0, dtype=np.float32), np.zeros(0, dtype=np.int64)
        handle = None
        if filter_mask is not None:
            handle = filter_mask if isinstance(filter_mask, FilterHandle) else FilterHandle(filter_mask)
        self._ensure_staged()
        if metric in TWO_PASS_METRICS or self.streaming:
            # top-(max_results) two-pass + threshold filter instead of
            # materializing and fetching the (1, N_pad) score matrix — the
            # semantics are identical because range results are capped at
            # the best max_results anyway (reference streams a threshold
            # test the same way, engine.rs:6410). Distances are exact (host
            # rescore); only the order-N fetch is gone.
            qv = np.asarray(query, dtype=np.float32).reshape(1, -1)
            d, i = self.search(qv, max_results, metric, filter_mask=handle)
            d, i = d[0], i[0]
            ok = i >= 0
            ok &= (d <= threshold) if metric.ascending else (d >= threshold)
            return d[ok].astype(np.float32), i[ok].astype(np.int64)
        q = jnp.asarray(np.asarray(query, dtype=np.float32).reshape(1, -1))
        qt = jax.jit(D.query_transform, static_argnames=("metric",))(q, metric)
        ct = self.transform(metric)
        valid = self.valid_mask(handle)
        chunk = scan_chunk_size(metric, self.n_pad, 1)
        scores = np.asarray(flat_scores(qt, ct, valid, metric=metric, chunk=chunk))[0]
        ok = ~np.isnan(scores)
        if metric.ascending:
            ok &= scores <= threshold
        else:
            ok &= scores >= threshold
        idx = np.nonzero(ok)[0]
        vals = scores[idx]
        order = np.argsort(vals, kind="stable")
        if not metric.ascending:
            order = order[::-1]
        order = order[:max_results]
        return vals[order].astype(np.float32), idx[order].astype(np.int64)

    def rescore(self, queries: np.ndarray, cand_ids: np.ndarray, metric: Metric):
        """Exact (B, C) distances for explicit candidate rows. The matmul
        family rescores on the host mirror; other metrics rescore on device
        (their distance lanes already live there)."""
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        ids = np.asarray(cand_ids)
        if ids.ndim == 1:
            ids = np.broadcast_to(ids, (q.shape[0], ids.shape[0]))
        valid = ids >= 0
        safe = np.where(valid, ids, 0)
        # flat 1-D gather then reshape (2-D fancy indexing is ~3.5x slower)
        host_rows = lambda: self._host[safe.ravel()].reshape(safe.shape + (self.dim,))  # noqa: E731
        if metric in TWO_PASS_METRICS:
            exact = host_exact_scores(q, host_rows(), metric)
            return np.where(valid, exact, np.nan)
        if self.streaming:
            rows = jnp.asarray(host_rows())
        else:
            rows = self._data[jnp.asarray(safe.astype(np.int32))].astype(jnp.float32)
        vd = jnp.asarray(valid)
        out = rescore_rows(q, rows * vd[..., None], vd, metric=metric)
        return np.asarray(out)


def _keep_mask(proxy: np.ndarray, ascending: bool) -> np.ndarray:
    keyed = -proxy if ascending else proxy
    return keyed > -np.inf


def decode_packed(packed_np: np.ndarray, k: int, metric: Metric):
    """Decode + trim a fetched packed search result."""
    dists, ids = unpack_search_step(packed_np)
    keep = _keep_mask(dists, metric.ascending)
    return _trim_results(dists[:, :k], ids[:, :k], keep[:, :k], k)


def _trim_results(dists: np.ndarray, ids: np.ndarray, keep: np.ndarray, k: int):
    """Compact each row's surviving entries (order-preserving, vectorized —
    a per-row Python loop here cost ~10 ms at B=256 on a 1-core host)."""
    counts = keep.sum(axis=1)
    width = int(counts.max(initial=0))
    # stable partition: kept entries first, original order preserved
    order = np.argsort(~keep, axis=1, kind="stable")[:, :width]
    live = np.arange(width)[None, :] < counts[:, None]
    out_d = np.where(live, np.take_along_axis(dists, order, axis=1), 0.0).astype(np.float32)
    out_i = np.where(live, np.take_along_axis(ids, order, axis=1), -1).astype(np.int64)
    return out_d, out_i
