"""The flat-scan engine: HBM-resident corpus blocks + fused distance/top-k.

This replaces the reference's mmap scan engine (reference:
src/storage/flat_mmap.rs — rayon-chunked SIMD scan with per-thread top-k and
merge, :1173/:4876). The TPU formulation: the corpus lives in HBM as one
padded device array; a search is a chunked scan where each chunk computes a
(B, C) distance block (MXU matmul for the dot-product family, VPU lanes
otherwise), takes a per-chunk top-k in registers/VMEM, and the per-chunk
winners merge with one final ``lax.top_k``. ``lax.map`` sequences the chunks
so peak memory stays bounded while XLA pipelines HBM reads.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import MATMUL_METRICS, Metric
from . import distance as D
from .topk import masked_top_k, merge_top_k

# Pad granularity for the corpus row dimension. Keeping it a multiple of the
# MXU/VPU lane width keeps every chunk fully tiled.
ROW_BLOCK = 8192

# Chunk sizes for the lax.map scan: matmul metrics touch (C, D) + (B, C) per
# step; elementwise metrics materialize (B, C, D) lanes, so they use smaller
# chunks.
MATMUL_CHUNK = 131072
ELEMWISE_CHUNK = 8192


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# score-matrix element budget for the single-shot path (B * N_pad f32)
SINGLE_SHOT_BUDGET = 1 << 28  # 256M elems = 1 GB HBM scratch


def scan_chunk_size(metric: Metric, n_pad: int, batch: int = 1) -> int:
    if metric in MATMUL_METRICS:
        # Matmul metrics materialize only (B, N) scores: single-shot lets XLA
        # fuse matmul + top-k at full HBM bandwidth. Chunk only when the
        # score matrix would be too large.
        if batch * n_pad <= SINGLE_SHOT_BUDGET:
            return n_pad
        return MATMUL_CHUNK
    return min(ELEMWISE_CHUNK, n_pad)


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
    """Fully-fused single-dispatch search: raw queries in, one packed f32
    array out — (B, 2*k') with distances in [:, :k'] and row ids bitcast into
    [:, k':]. One dispatch + one host fetch per search keeps per-query
    overhead at the transport floor (the remote-TPU relay charges ~30 ms per
    host sync regardless of work, so fusing matters more than FLOPs here)."""
    qt = D.query_transform(q, metric)
    dists, ids = flat_topk(qt, ct, valid, metric=metric, k=k, chunk=chunk, ascending=ascending)
    # Encode int ids as *normal* f32 values (a raw bitcast of small ints makes
    # denormals, which the TPU flushes to zero in transit): 12-bit lo + hi
    # halves are exactly representable and cover ids up to 2^31.
    ids = ids.astype(jnp.int32)
    hi = (ids >> 12).astype(jnp.float32)
    lo = (ids & 0xFFF).astype(jnp.float32)
    return jnp.concatenate([dists, hi, lo], axis=-1)


def unpack_search_step(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side decode of flat_search_step output."""
    packed = np.asarray(packed)
    k = packed.shape[-1] // 3
    dists = packed[:, :k].astype(np.float32)
    hi = packed[:, k : 2 * k].astype(np.int64)
    lo = packed[:, 2 * k :].astype(np.int64)
    return dists, (hi << 12) | lo


@partial(jax.jit, static_argnames=("metric", "k", "chunk"))
def bf16_flat_topk(q: jnp.ndarray, x_bf16: jnp.ndarray, valid: jnp.ndarray,
                   *, metric: Metric, k: int, chunk: int):
    """First-pass approximate top-k over a bf16 corpus copy (half the HBM
    traffic of f32). Matmul metrics run bf16xbf16 with f32 accumulation;
    the L1 family upcasts per chunk in-register."""
    q16 = q.astype(jnp.bfloat16)
    n_pad = x_bf16.shape[0]
    ascending = metric.ascending

    def score_block(xb):
        if metric in (Metric.IP, Metric.L2, Metric.COSINE):
            ip = jax.lax.dot_general(
                q16, xb.T, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if metric is Metric.IP:
                return ip
            xf = xb.astype(jnp.float32)
            x_sq = jnp.sum(xf * xf, axis=-1)
            q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
            if metric is Metric.L2:
                return jnp.maximum(q_sq + x_sq[None, :] - 2.0 * ip, 0.0)
            denom = jnp.sqrt(q_sq * x_sq[None, :])
            return jnp.where(denom < 1e-30, 1.0, 1.0 - ip / jnp.maximum(denom, 1e-30))
        xf = xb.astype(jnp.float32)
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
        return masked_top_k(score_block(x_bf16), min(k, n_pad), ascending, valid)
    n_main = n_chunks * chunk
    kc = min(k, chunk)

    def body(operand):
        xb, v, base = operand
        d, i = masked_top_k(score_block(xb), kc, ascending, v)
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
        d_t, i_t = masked_top_k(score_block(x_bf16[n_main:]), min(k, n_pad - n_main),
                                ascending, valid[n_main:])
        dists = jnp.concatenate([dists, d_t], axis=1)
        ids = jnp.concatenate([ids, (i_t + n_main).astype(jnp.int32)], axis=1)
    return merge_top_k(dists, ids, min(k, n_pad), ascending)


@partial(jax.jit, static_argnames=("metric",))
def rescore_rows(q: jnp.ndarray, rows: jnp.ndarray, row_valid: jnp.ndarray, *, metric: Metric):
    """Exact distances from each query (B, D) to an explicit candidate row
    block (B, C, D) — the rescore step behind quantized/ANN shortlists
    (reference: src/storage/vector_store.rs:611)."""

    def one(q_row, rows_b, valid_b):
        qt = D.query_transform(q_row[None], metric)
        ct = D.corpus_transform(rows_b, metric)
        scores = D.pairwise(qt, ct, metric)[0]
        return jnp.where(valid_b, scores, jnp.nan)

    return jax.vmap(one)(q, rows, row_valid)


class DeviceCorpus:
    """HBM-resident, padded, growable corpus for one vector field.

    Mirrors the role of the reference's FlatMmap (src/storage/flat_mmap.rs:89)
    but holds rows in device HBM. Rows are appended in padded blocks of
    ``ROW_BLOCK``; capacity grows geometrically so recompiles happen only at
    O(log n) distinct shapes. Per-metric corpus transforms (norms, centered
    rows, probability stats, binarized rows) are computed on-device once and
    cached until the data mutates.
    """

    def __init__(self, dim: int, dtype: str = "float32"):
        self.dim = int(dim)
        self.dtype = dtype
        self._store_dtype = jnp.float16 if dtype == "float16" else jnp.float32
        self.n = 0
        self.capacity = 0
        self._data: Optional[jnp.ndarray] = None  # (cap, dim) store dtype
        self._tombs: Optional[jnp.ndarray] = None  # (cap,) bool, True = deleted
        self._transforms: dict[Metric, dict] = {}

    # ── data management ──────────────────────────────────────────────────

    def _grow(self, need: int) -> None:
        new_cap = max(ROW_BLOCK, self.capacity)
        while new_cap < need:
            new_cap *= 2
        if new_cap == self.capacity:
            return
        pad_rows = new_cap - self.capacity
        zeros = jnp.zeros((pad_rows, self.dim), dtype=self._store_dtype)
        tomb_pad = jnp.zeros((pad_rows,), dtype=jnp.bool_)
        if self._data is None:
            self._data = zeros
            self._tombs = tomb_pad
        else:
            self._data = jnp.concatenate([self._data, zeros], axis=0)
            self._tombs = jnp.concatenate([self._tombs, tomb_pad], axis=0)
        self.capacity = new_cap

    def append(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, dtype=np.float32)
        if rows.ndim != 2 or rows.shape[1] != self.dim:
            raise ValueError(f"expected (*, {self.dim}) rows, got {rows.shape}")
        m = rows.shape[0]
        if m == 0:
            return
        self._grow(self.n + m)
        dev_rows = jnp.asarray(rows.astype(self._store_dtype))
        self._data = jax.lax.dynamic_update_slice(self._data, dev_rows, (self.n, 0))
        self.n += m
        self._transforms.clear()

    def overwrite(self, row_ids: np.ndarray, rows: np.ndarray) -> None:
        """Positional overwrite (upsert path)."""
        rows = np.asarray(rows, dtype=np.float32)
        dev_rows = jnp.asarray(rows.astype(self._store_dtype))
        idx = jnp.asarray(np.asarray(row_ids, dtype=np.int32))
        self._data = self._data.at[idx].set(dev_rows)
        self._transforms.clear()

    def set_tombstones(self, tombs: np.ndarray) -> None:
        """Replace the tombstone mask from the host bitset (first n rows)."""
        full = np.zeros(self.capacity, dtype=bool)
        m = min(len(tombs), self.capacity)
        full[:m] = tombs[:m]
        self._tombs = jnp.asarray(full)

    def reset(self) -> None:
        self.n = 0
        self.capacity = 0
        self._data = None
        self._tombs = None
        self._transforms.clear()

    # ── derived state ────────────────────────────────────────────────────

    @property
    def n_pad(self) -> int:
        if self.capacity == 0:
            return 0
        # Scan over the occupied prefix only, padded to ROW_BLOCK.
        return min(self.capacity, _round_up(max(self.n, 1), ROW_BLOCK))

    def transform(self, metric: Metric) -> dict:
        ct = self._transforms.get(metric)
        need = self.n_pad
        if ct is None or next(iter(jax.tree.leaves(ct))).shape[0] != need:
            data = self._data[:need].astype(jnp.float32)
            ct = jax.jit(D.corpus_transform, static_argnames=("metric",))(data, metric)
            self._transforms[metric] = ct
        return ct

    def valid_mask(self, filter_mask: Optional[np.ndarray] = None) -> jnp.ndarray:
        n_pad = self.n_pad
        base = jnp.arange(n_pad, dtype=jnp.int32) < self.n
        base = base & ~self._tombs[:n_pad]
        if filter_mask is not None:
            fm = np.zeros(n_pad, dtype=bool)
            m = min(len(filter_mask), n_pad)
            fm[:m] = filter_mask[:m]
            base = base & jnp.asarray(fm)
        return base

    def rows(self, row_ids: np.ndarray) -> jnp.ndarray:
        idx = jnp.asarray(np.asarray(row_ids, dtype=np.int32))
        return self._data[idx].astype(jnp.float32)

    # ── search entry points ──────────────────────────────────────────────

    def search_packed(
        self,
        queries: np.ndarray,
        k: int,
        metric: Metric,
        filter_mask: Optional[np.ndarray] = None,
    ) -> Optional[jnp.ndarray]:
        """Asynchronously dispatch a fused search; returns the packed device
        array (B, 3k') or None for an empty corpus. Decode with
        :func:`decode_packed`. Enables pipelined query streams with grouped
        host fetches."""
        if self.n == 0:
            return None
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        ct = self.transform(metric)
        valid = self.valid_mask(filter_mask)
        chunk = scan_chunk_size(metric, self.n_pad, q.shape[0])
        return flat_search_step(
            q, ct, valid, metric=metric, k=k, chunk=chunk, ascending=metric.ascending
        )

    def search_submit(
        self,
        queries: np.ndarray,
        k: int,
        metric: Metric,
        filter_mask: Optional[np.ndarray] = None,
    ):
        """Dispatch asynchronously; returns a zero-arg resolver performing
        the single host sync."""
        packed = self.search_packed(queries, k, metric, filter_mask)
        if packed is None:
            b = np.atleast_2d(np.asarray(queries)).shape[0]
            empty = (np.zeros((b, 0), dtype=np.float32), np.zeros((b, 0), dtype=np.int64))
            return lambda: empty
        return lambda: decode_packed(np.asarray(packed), k, metric)

    def search(
        self,
        queries: np.ndarray,
        k: int,
        metric: Metric,
        filter_mask: Optional[np.ndarray] = None,
    ):
        """Top-k scan: one fused device dispatch + one host fetch. Returns
        (dists (B,k'), row_ids (B,k')) trimmed of invalid entries."""
        return self.search_submit(queries, k, metric, filter_mask)()

    # ── approximate flat search (reference: storage/approx_search.rs) ───

    APPROX_MIN_ROWS = 65_536  # engage threshold (approx_search.rs:49)

    def search_approx(
        self,
        queries: np.ndarray,
        k: int,
        metric: Metric,
        eps: float = 1e-4,
        filter_mask: Optional[np.ndarray] = None,
    ):
        """Approximate two-pass scan: a full-dimension bfloat16 first pass
        (half the HBM bytes of the f32 exact scan, so ~2x the bandwidth)
        produces an oversampled shortlist that the f32 exact rescore refines.
        Estimation error is ~2^-8 relative — far below typical score gaps —
        so recall stays near-exact while eps controls the oversampling
        cushion. Falls back to the exact scan below the engage threshold,
        mirroring the reference (approx_search.rs:49)."""
        if self.n <= self.APPROX_MIN_ROWS or not metric.supports_flat_approx:
            return self.search(queries, k, metric, filter_mask)
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        n_pad = self.n_pad

        cached = self._transforms.get("approx_bf16")
        if cached is None or cached.shape[0] != n_pad:
            cached = self._data[:n_pad].astype(jnp.bfloat16)
            self._transforms["approx_bf16"] = cached

        oversample = 4 if eps >= 1e-3 else (8 if eps >= 1e-5 else 16)
        valid = self.valid_mask(filter_mask)
        shortlist = min(max(k * oversample, k), n_pad)
        d_s, i_s = bf16_flat_topk(
            jnp.asarray(q), cached, valid,
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
        filter_mask: Optional[np.ndarray] = None,
    ):
        """All rows within ``threshold`` (<= for ascending metrics, >= for
        IP), sorted best-first, capped at max_results
        (reference: engine.rs:6410 search_range)."""
        if self.n == 0:
            return np.zeros(0, dtype=np.float32), np.zeros(0, dtype=np.int64)
        q = jnp.asarray(np.asarray(query, dtype=np.float32).reshape(1, -1))
        qt = jax.jit(D.query_transform, static_argnames=("metric",))(q, metric)
        ct = self.transform(metric)
        valid = self.valid_mask(filter_mask)
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
        """Exact (B, C) distances for explicit candidate rows."""
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        ids = np.asarray(cand_ids)
        if ids.ndim == 1:
            ids = np.broadcast_to(ids, (q.shape[0], ids.shape[0]))
        rows = self._data[jnp.asarray(ids.astype(np.int32))].astype(jnp.float32)
        valid = jnp.asarray(ids >= 0)
        safe_rows = rows * valid[..., None]
        out = rescore_rows(q, safe_rows, valid, metric=metric)
        return np.asarray(out)


def decode_packed(packed_np: np.ndarray, k: int, metric: Metric):
    """Decode + trim a fetched flat_search_step result."""
    dists, ids = unpack_search_step(packed_np)
    keyed = -dists if metric.ascending else dists
    keep = keyed > -np.inf
    return _trim_results(dists, ids, keep, k)


def _trim_results(dists: np.ndarray, ids: np.ndarray, keep: np.ndarray, k: int):
    """Compact each row's surviving entries (order-preserving)."""
    b = dists.shape[0]
    counts = keep.sum(axis=1)
    width = int(counts.max(initial=0))
    out_d = np.zeros((b, width), dtype=np.float32)
    out_i = np.full((b, width), -1, dtype=np.int64)
    for r in range(b):
        m = keep[r]
        c = int(counts[r])
        out_d[r, :c] = dists[r, m]
        out_i[r, :c] = ids[r, m]
    return out_d, out_i
