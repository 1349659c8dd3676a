"""Graph-ANN kernels: batched beam search + batched Vamana construction.

The reference's graph indexes walk pointers one node at a time on CPU
(reference: src/index/hnsw.rs:625 search_layer, src/index/diskann.rs:602
PQ-guided beam, :798-1084 Vamana build). Pointer-chasing is hostile to TPUs,
so the TPU formulation batches everything:

  * search: a whole query batch advances together. Each step expands the best
    unexpanded candidate per query, gathers all R neighbors at once, computes
    the (B, R) distance block with one matmul, and merges into a sorted
    candidate pool via `lax.top_k`. A (B, N) visited bitmap lives in HBM.
  * build: points are inserted in batches — one batched beam search against
    the current graph discovers candidates for 1024 points at once, candidate
    pairwise distances come from one einsum, and the alpha robust-prune runs
    vectorized over the batch.

Distance orientation: the kernel works in "keyed" space (bigger = better),
so it serves every metric the index families allow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import Metric
from . import distance as D

NEG_INF = np.float32(-np.inf)  # host scalar: device constants stall tunnel lowering (see ops/distance.py:INF)

# Candidates expanded per lockstep beam step. 1 = classic best-first (the
# recall-optimal order: re-rank after every expansion — measured 0.975 vs
# 0.912 recall@10 at expand 1 vs 4 on a 4k toy). >1 trades a little recall
# for ~E x fewer while_loop steps; exposed for throughput experiments.
import os as _os

BEAM_EXPAND = int(_os.environ.get("LYNSE_TPU_BEAM_EXPAND", "1"))


def _resolve_expand(expand: int | None, beam: int) -> int:
    """Resolve the per-step expansion width BEFORE tracing.

    The jitted kernels take ``expand`` as a static argument so the value is
    part of the executable cache key; resolving the ``BEAM_EXPAND`` default
    here (in the un-jitted wrappers) means a kernel never closes over the
    module global — a cached executable traced under one value can't be
    silently reused after the global (or env var) changes."""
    return max(1, min(expand if expand is not None else BEAM_EXPAND, beam))


def _mask_step_dups(fresh, nbrs, rows_idx):
    """Within one lockstep step, mask all but the first occurrence of each
    neighbor id per row. Two expanded nodes sharing a neighbor would each
    pass the visited check and occupy two pool slots; the argsort groups
    equal ids so runs can be detected, and the scatter back through
    ``order`` is a per-row permutation, so first-occurrence masking is
    exact. Traced twin of the numpy-side _mask_dup_cands."""
    b = fresh.shape[0]
    sort_key = jnp.where(fresh, nbrs, jnp.int32(2**30))
    order = jnp.argsort(sort_key, axis=1)
    srt = jnp.take_along_axis(sort_key, order, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((b, 1), bool),
         (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] < 2**30)], axis=1)
    dup = jnp.zeros_like(fresh).at[rows_idx, order].set(dup_sorted)
    return fresh & ~dup


def entry_sample_ids(n: int, sample: int, *, sq_norms=None,
                     norm_top: int = 0, seed: int = 1234) -> np.ndarray:
    """Deterministic entry-scan node sample with a FIXED size per capacity.

    When a top-norm band is requested (raw-MIPS: the ground truth
    concentrates in high-norm rows the walk can't reach, so the band must
    be covered exactly), the random part is drawn from the band's
    COMPLEMENT rather than unioned afterwards — the result is exactly
    ``min(sample, n - top) + top`` distinct rows, so the jitted entry_scan
    keeps one input shape across commits instead of recompiling on every
    data-dependent union size (45-200 s per executable on the dev tunnel)."""
    rng = np.random.default_rng(seed + n)
    if sq_norms is not None and norm_top > 0 and n > sample:
        top = min(norm_top, n)
        band = np.argpartition(-np.asarray(sq_norms)[:n], top - 1)[:top]
        band = band.astype(np.int32)
        mask = np.ones(n, dtype=bool)
        mask[band] = False
        rest = np.nonzero(mask)[0].astype(np.int32)
        c = min(sample, rest.size)
        picked = rng.choice(rest, size=c, replace=False) if c < rest.size else rest
        return np.sort(np.concatenate([picked.astype(np.int32), band]))
    c = min(n, sample)
    return (np.sort(rng.choice(n, size=c, replace=False))
            if c < n else np.arange(n)).astype(np.int32)


def _keyed_pairwise(q, x, metric: Metric):
    """(B, C) similarity keys (bigger = better) between query and rows."""
    qt = D.query_transform(q, metric)
    ct = D.corpus_transform(x, metric)
    scores = D.pairwise(qt, ct, metric)
    return -scores if metric.ascending else scores



def _beam_core(keyed_ids, graph, starts, valid, b, *, beam, max_steps, expand):
    """Shared lockstep best-first engine behind every guided beam kernel.

    ``keyed_ids``: (B, C) int32 node ids -> (B, C) oriented proxy keys
    (bigger = better) — the ONLY thing the guidance tiers (exact f32 /
    bf16 / SQ8 / PQ) differ in. Each while_loop step expands the best E
    unexpanded pool candidates per query, gathers their neighbors, scores
    them with ``keyed_ids``, and top_k-merges into the pool. A (B, N)
    visited bitmap lives in HBM.

    Returns (pool_keys (B, beam), pool_ids (B, beam), scanned (B,)) —
    best-first in proxy key space, ids == -1 where the pool ran dry;
    scanned counts visited nodes (reference engine.rs:6906
    QueryProfile.scanned_vectors).
    """
    n, r = graph.shape
    starts_b = jnp.broadcast_to(starts[None, :], (b, starts.shape[0])) \
        if starts.ndim == 1 else starts
    s = starts_b.shape[1]
    keys0 = jnp.where(valid[starts_b], keyed_ids(starts_b), NEG_INF)

    pool_ids = jnp.full((b, beam), -1, dtype=jnp.int32)
    pool_keys = jnp.full((b, beam), NEG_INF)
    pool_exp = jnp.zeros((b, beam), dtype=bool)
    top0, idx0 = jax.lax.top_k(keys0, min(s, beam))
    pool_keys = pool_keys.at[:, : top0.shape[1]].set(top0)
    pool_ids = pool_ids.at[:, : top0.shape[1]].set(
        jnp.take_along_axis(starts_b, idx0, axis=1).astype(jnp.int32))

    visited = jnp.zeros((b, n), dtype=bool)
    visited = visited.at[jnp.arange(b)[:, None], jnp.maximum(pool_ids, 0)].set(pool_ids >= 0)

    e = expand
    rows_idx = jnp.arange(b)[:, None]

    def step(state):
        pool_ids, pool_keys, pool_exp, visited, steps = state
        # best E unexpanded candidates per query
        cand_key = jnp.where(pool_exp | (pool_ids < 0), NEG_INF, pool_keys)
        top_cand, best = jax.lax.top_k(cand_key, e)  # (B, E)
        best_ids = jnp.take_along_axis(pool_ids, best, axis=1)
        has_work = top_cand > NEG_INF
        # marking empty slots expanded is harmless: the cond predicate
        # already excludes pool_ids < 0 slots
        pool_exp = pool_exp.at[rows_idx, best].set(True)

        nbrs = graph[jnp.maximum(best_ids, 0)].reshape(b, e * r)  # (B, E*R)
        nbr_ok = ((nbrs >= 0).reshape(b, e, r) & has_work[:, :, None]).reshape(b, e * r)
        safe_nbrs = jnp.maximum(nbrs, 0)
        seen = visited[rows_idx, safe_nbrs]
        fresh = nbr_ok & ~seen
        if e > 1:  # static branch: a single parent's adjacency row is
            # duplicate-free by construction (robust prune + build-side
            # dedup), so the cross-parent mask would be a per-step no-op
            fresh = _mask_step_dups(fresh, nbrs, rows_idx)
        # scatter-MAX, not set: safe_nbrs carries duplicate indices (masked
        # dup occurrences, -1 pads clamped to 0), and a duplicate .set()
        # write of a stale False could race out the True — un-marking a
        # node added to the pool this step, letting a later parent re-add
        # it (observed as duplicate pool ids under expand>1)
        visited = visited.at[rows_idx, safe_nbrs].max(fresh)
        keys = jnp.where(fresh & valid[safe_nbrs], keyed_ids(safe_nbrs), NEG_INF)

        # merge pool and fresh neighbors, keep top `beam`
        all_keys = jnp.concatenate([pool_keys, keys], axis=1)
        all_ids = jnp.concatenate([pool_ids, jnp.where(fresh, nbrs, -1)], axis=1)
        all_exp = jnp.concatenate([pool_exp, jnp.zeros_like(fresh)], axis=1)
        top_keys, pos = jax.lax.top_k(all_keys, beam)
        gather = lambda a: jnp.take_along_axis(a, pos, axis=1)  # noqa: E731
        return gather(all_ids), top_keys, gather(all_exp), visited, steps + 1

    def cond(state):
        pool_ids, pool_keys, pool_exp, visited, steps = state
        unexpanded = (~pool_exp) & (pool_ids >= 0) & (pool_keys > NEG_INF)
        return (steps < max_steps) & jnp.any(unexpanded)

    pool_ids, pool_keys, pool_exp, visited, _ = jax.lax.while_loop(
        cond, step, (pool_ids, pool_keys, pool_exp, visited, jnp.int32(0))
    )
    pool_ids = jnp.where(pool_keys > NEG_INF, pool_ids, -1)
    return pool_keys, pool_ids, jnp.sum(visited, axis=1, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("metric", "beam", "max_steps", "k", "expand"))
def _beam_search_jit(
    q: jnp.ndarray,  # (B, D)
    corpus: jnp.ndarray,  # (N, D) f32
    graph: jnp.ndarray,  # (N, R) int32, -1 padded
    starts: jnp.ndarray,  # (S,) int32 entry points (shared)
    valid: jnp.ndarray,  # (N,) bool — live rows (tombstones/filters)
    *,
    metric: Metric,
    beam: int,
    max_steps: int,
    k: int,
    expand: int,
):
    """Batched best-first beam search over EXACT f32 rows (the small-corpus
    tier). Returns (keys (B,k), ids (B,k), scanned (B,)) with ids == -1
    where the pool ran dry; keys are oriented (bigger = better). See
    :func:`_beam_core` for the engine; this tier's keyed_ids computes true
    per-metric distances."""
    b, d = q.shape

    def keyed_ids(node_ids: jnp.ndarray) -> jnp.ndarray:
        rows = corpus[node_ids]  # (B, C, D)
        return jax.vmap(lambda qq, xx: _keyed_pairwise(qq[None], xx, metric)[0])(q, rows)

    pool_keys, pool_ids, scanned = _beam_core(
        keyed_ids, graph, starts, valid, b,
        beam=beam, max_steps=max_steps, expand=expand)
    k_eff = min(k, beam)
    top_keys, pos = jax.lax.top_k(pool_keys, k_eff)
    top_ids = jnp.take_along_axis(pool_ids, pos, axis=1)
    top_ids = jnp.where(top_keys > NEG_INF, top_ids, -1)
    return top_keys, top_ids, scanned


def beam_search(q, corpus, graph, starts, valid, *, metric: Metric,
                beam: int, max_steps: int, k: int,
                expand: int | None = None):
    """See _beam_search_jit; resolves the ``expand`` default eagerly."""
    return _beam_search_jit(q, corpus, graph, starts, valid, metric=metric,
                            beam=beam, max_steps=max_steps, k=k,
                            expand=_resolve_expand(expand, beam))


@partial(jax.jit, static_argnames=("metric_kind", "beam", "max_steps", "expand"))
def _beam_search_pq_jit(
    q: jnp.ndarray,  # (B, D) f32
    codes: jnp.ndarray,  # (N, M) uint8/int32 PQ codes (device-resident)
    codebooks: jnp.ndarray,  # (M, 256, Ds) f32
    alpha: jnp.ndarray,  # (N,) f32 per-row scale correction (x.x_hat/x_hat.x_hat)
    row_sq: jnp.ndarray,  # (N,) TRUE squared norms (l2/cos terms)
    graph: jnp.ndarray,  # (N, R) int32, -1 padded
    starts: jnp.ndarray,  # (S,) int32 entry points (shared)
    valid: jnp.ndarray,  # (N,) bool
    *,
    metric_kind: str,  # "ip" | "l2" | "cos"
    beam: int,
    max_steps: int,
    expand: int,
):
    """PQ-guided batched beam search (the deepest layered tier, reference:
    diskann.rs:602 search_graph_pq + :276 flush_layered).

    The beam never touches f32 corpus rows: per query a (M, 256) ADC LUT is
    built with one einsum, and each expansion scores neighbors by gathering
    codes + LUT-summing. Two corrections sharpen the proxy beyond the
    reference's raw ADC walk (both free at walk time, one f32/row each):

      * ``alpha`` — the least-squares row scale (x.x_hat / x_hat.x_hat):
        ip_hat = alpha * ADC recovers the norm information PQ smears, which
        is exactly what norm-skewed MIPS walks die of.
      * ``row_sq`` — TRUE squared norms (computed at encode time from the
        real rows) rather than reconstructed ones for the l2/cos keys.

    The engine exact-rescores the returned pool from the host mirror
    afterwards (uses_store_rescore semantics, vector_store.rs:611), so HBM
    holds only codes + adjacency — the corpus can exceed the device budget
    and graph search still runs.

    Returns (keys (B, beam), ids (B, beam), scanned (B,)) — the FULL pool,
    best-first in approximate key space.
    """
    b, d = q.shape
    m, kcent, ds = codebooks.shape
    q_sub = q.reshape(b, m, ds)
    lut = jnp.einsum("bms,mks->bmk", q_sub, codebooks,
                     preferred_element_type=jnp.float32)  # (B, M, 256)

    def keyed_ids(node_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, C) node ids -> (B, C) oriented keys (bigger = better).
        Per-query-constant terms are dropped: they cannot change the
        beam's ordering and the exact rescore replaces the values."""
        cd = codes[node_ids].astype(jnp.int32)  # (B, C, M)

        def one(lut_q, cd_q):
            return jnp.take_along_axis(lut_q.T, cd_q, axis=0).sum(-1)

        ip = alpha[node_ids] * jax.vmap(one)(lut, cd)  # (B, C)
        if metric_kind == "ip":
            return ip
        rs = row_sq[node_ids]
        if metric_kind == "l2":
            return 2.0 * ip - rs  # key(-l2) + const
        return ip * jax.lax.rsqrt(jnp.maximum(rs, 1e-30))  # cos + const scale

    return _beam_core(keyed_ids, graph, starts, valid, b,
                      beam=beam, max_steps=max_steps, expand=expand)


def beam_search_pq(q, codes, codebooks, alpha, row_sq, graph, starts, valid,
                   *, metric_kind: str, beam: int, max_steps: int,
                   expand: int | None = None):
    """See _beam_search_pq_jit; resolves the ``expand`` default eagerly."""
    return _beam_search_pq_jit(q, codes, codebooks, alpha, row_sq, graph,
                               starts, valid, metric_kind=metric_kind,
                               beam=beam, max_steps=max_steps,
                               expand=_resolve_expand(expand, beam))


@partial(jax.jit, static_argnames=("metric_kind", "beam", "max_steps", "expand"))
def _beam_search_bf16_jit(
    q: jnp.ndarray,  # (B, D) f32
    dev16: jnp.ndarray,  # (cap, D) bf16, MEAN-CENTERED rows (DeviceCorpus.data16)
    mean: jnp.ndarray,  # (D,) f32 corpus mean
    xm: jnp.ndarray,  # (cap,) f32 mean.(x-mean) per row
    xc_sq: jnp.ndarray,  # (cap,) f32 centered-row squared norms
    xsq_true: jnp.ndarray,  # (cap,) f32 true squared norms (cos only)
    graph: jnp.ndarray,  # (N, R) int32, -1 padded
    starts: jnp.ndarray,  # (S,) or (B, S) int32 entry points
    valid: jnp.ndarray,  # (N,) bool
    *,
    metric_kind: str,  # "ip" | "l2" | "cos"
    beam: int,
    max_steps: int,
    expand: int,
):
    """Beam search guided by the RESIDENT centered-bf16 scan array.

    The high-precision tier of the layered design (reference: diskann.rs:276
    — the reference walks PQ codes because its exact rows live on SSD; here
    the bf16 scan copy is already in HBM for the flat path, so when the
    corpus fits the device budget the beam is guided at bf16 precision and
    only falls back to SQ8/PQ guidance in streaming mode). Ranking
    corrections mirror ops/scan._bf16_scores: per-query-constant terms are
    dropped, the engine exact-rescores the returned pool from the host f32
    mirror (uses_store_rescore semantics, vector_store.rs:611).

    Returns (keys (B, beam), ids (B, beam), scanned (B,)) — the FULL pool,
    best-first in proxy key space; ids == -1 where the pool ran dry.
    """
    b, d = q.shape
    qc = q - mean[None, :]  # (B, D) f32
    qc16 = qc.astype(jnp.bfloat16)
    q_dot_mean = jnp.sum(q * mean[None, :], axis=-1, keepdims=True)  # (B, 1)

    def keyed_ids(node_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, C) node ids -> oriented proxy keys (bigger = better)."""
        rows = dev16[node_ids]  # (B, C, D) bf16
        ip_c = jnp.einsum("bd,bcd->bc", qc16, rows,
                          preferred_element_type=jnp.float32)
        if metric_kind == "ip":
            return ip_c + xm[node_ids]  # + q.mean (const, dropped)
        if metric_kind == "l2":
            return 2.0 * ip_c - xc_sq[node_ids]  # key(-l2) + const
        num = ip_c + xm[node_ids] + q_dot_mean
        return num * jax.lax.rsqrt(jnp.maximum(xsq_true[node_ids], 1e-30))

    return _beam_core(keyed_ids, graph, starts, valid, b,
                      beam=beam, max_steps=max_steps, expand=expand)


def beam_search_bf16(q, dev16, mean, xm, xc_sq, xsq_true, graph, starts,
                     valid, *, metric_kind: str, beam: int, max_steps: int,
                     expand: int | None = None):
    """See _beam_search_bf16_jit; resolves the ``expand`` default eagerly."""
    return _beam_search_bf16_jit(q, dev16, mean, xm, xc_sq, xsq_true, graph,
                                 starts, valid, metric_kind=metric_kind,
                                 beam=beam, max_steps=max_steps,
                                 expand=_resolve_expand(expand, beam))


@partial(jax.jit, static_argnames=("metric_kind", "beam", "max_steps", "expand"))
def _beam_search_sq8_jit(
    q: jnp.ndarray,  # (B, D) f32
    codes: jnp.ndarray,  # (N, D) int8 SQ8 codes (centered: u8 - 128)
    lo: jnp.ndarray,  # (D,) f32 per-dim minimum
    scale: jnp.ndarray,  # (D,) f32 per-dim step
    row_sq: jnp.ndarray,  # (N,) TRUE squared norms (l2/cos terms)
    graph: jnp.ndarray,  # (N, R) int32, -1 padded
    starts: jnp.ndarray,  # (S,) or (B, S) int32 entry points
    valid: jnp.ndarray,  # (N,) bool
    *,
    metric_kind: str,  # "ip" | "l2" | "cos"
    beam: int,
    max_steps: int,
    expand: int,
):
    """SQ8-guided beam search — the MIDDLE layered tier.

    Sits between bf16 guidance (2 bytes/dim, needs the full scan array
    resident) and PQ guidance (M bytes/row, coarse): SQ8 codes cost 1
    byte/dim, so a corpus whose bf16 copy exceeds HBM often still fits its
    int8 codes + adjacency on device — and 8-bit per-dim guidance walks at
    near-bf16 quality where PQ's subspace smearing collapses recall
    (r4 streaming DISKANN-IP measured 0.709 vs the 0.90 floor under PQ
    guidance). Decode never materializes: q.x_hat = (q*scale).c + const,
    so each expansion is one einsum over gathered int8 rows.
    """
    b, d = q.shape
    qs = q * scale[None, :]  # (B, D)
    q_const = jnp.sum(q * (lo + 128.0 * scale)[None, :], axis=-1,
                      keepdims=True)  # (B, 1) — q.(lo + 128*scale)

    def keyed_ids(node_ids: jnp.ndarray) -> jnp.ndarray:
        rows = codes[node_ids]  # (B, C, D) int8
        ip_c = jnp.einsum("bd,bcd->bc", qs, rows.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        if metric_kind == "ip":
            return ip_c  # + q_const (per-query, dropped)
        rs = row_sq[node_ids]
        if metric_kind == "l2":
            return 2.0 * ip_c - rs  # 2*q_const is per-query, dropped
        return (ip_c + q_const) * jax.lax.rsqrt(jnp.maximum(rs, 1e-30))

    return _beam_core(keyed_ids, graph, starts, valid, b,
                      beam=beam, max_steps=max_steps, expand=expand)


def beam_search_sq8(q, codes, lo, scale, row_sq, graph, starts, valid, *,
                    metric_kind: str, beam: int, max_steps: int,
                    expand: int | None = None):
    """See _beam_search_sq8_jit; resolves the ``expand`` default eagerly."""
    return _beam_search_sq8_jit(q, codes, lo, scale, row_sq, graph, starts,
                                valid, metric_kind=metric_kind, beam=beam,
                                max_steps=max_steps,
                                expand=_resolve_expand(expand, beam))


@partial(jax.jit, static_argnames=("metric", "s"))
def entry_scan(q: jnp.ndarray, sample_rows: jnp.ndarray,
               sample_ids: jnp.ndarray, valid: jnp.ndarray,
               *, metric: Metric, s: int) -> jnp.ndarray:
    """Per-query graph entry points: exact-scan a fixed node sample (one
    small matmul) and return each query's top-``s`` sample ids (B, s).
    Plays the role of HNSW's upper-layer descent for single-layer graphs —
    the reference's DiskANN enters at the medoid (diskann.rs:602), which
    collapses recall for MIPS/clustered data; a sampled entry scan is the
    batched TPU equivalent of a multi-start descent."""
    keys = _keyed_pairwise(q, sample_rows, metric)  # (B, C)
    keys = jnp.where(valid[sample_ids][None, :], keys, NEG_INF)
    _, idx = jax.lax.top_k(keys, min(s, sample_ids.shape[0]))
    return sample_ids[idx].astype(jnp.int32)


@partial(jax.jit, static_argnames=("metric",))
def candidate_pair_keys(rows: jnp.ndarray, metric: Metric) -> jnp.ndarray:
    """(BS, L, L) similarity keys among each point's candidates (used by the
    batched robust prune)."""

    def one(block):
        return _keyed_pairwise(block, block, metric)

    return jax.vmap(one)(rows)


def robust_prune_batch(
    point_keys: np.ndarray,  # (BS, L) key(point, candidate), bigger = closer
    pair_keys: np.ndarray,  # (BS, L, L) key(candidate_i, candidate_j)
    cand_ids: np.ndarray,  # (BS, L) int, -1 padded
    alpha: float,
    r: int,
    descending: bool = False,
) -> np.ndarray:
    """Vectorized alpha-pruning (reference: diskann.rs robust-prune :820-875).

    Works in key space (bigger = closer). For ascending metrics keys are
    negated distances and the alpha rule `dist(p,c) > alpha * dist(kept,c)`
    becomes the multiplicative key comparison. For DESCENDING metrics (IP,
    ``descending=True``) a multiplicative alpha on raw similarities inverts
    the long-range intent and collapses out-degree to ~1 (the reference
    documents the same failure, diskann.rs:827-829); following it, the rule
    becomes additive in log-space: prune c iff
    ``key(p,c) < key(kept,c) - ln(alpha)``.
    Returns (BS, r) pruned neighbor ids, -1 padded.
    """
    ln_alpha = float(np.log(max(alpha, 1.0)))
    bs, l = point_keys.shape
    order = np.argsort(-point_keys, axis=1, kind="stable")
    out = np.full((bs, r), -1, dtype=np.int64)
    out_n = np.zeros(bs, dtype=np.int64)
    pruned = cand_ids < 0  # (BS, L) candidates already dropped
    pruned |= ~np.isfinite(point_keys)

    for rank in range(l):
        idx = order[:, rank]  # (BS,)
        rows = np.arange(bs)
        active = (~pruned[rows, idx]) & (out_n < r)
        sel_rows = rows[active]
        if len(sel_rows) == 0:
            continue
        sel_idx = idx[active]
        out[sel_rows, out_n[sel_rows]] = cand_ids[sel_rows, sel_idx]
        out_n[sel_rows] += 1
        pruned[sel_rows, sel_idx] = True
        # alpha-dominance: drop candidates much closer to the kept node than
        # to the point.
        kept_keys = pair_keys[sel_rows, sel_idx, :]  # (n_sel, L)
        if descending:
            # similarity keys: additive log-space alpha (see docstring)
            dominated = point_keys[sel_rows] < kept_keys - ln_alpha
        else:
            # keys are -dist: dist(p,c) > a*dist(kept,c)
            #  <=> -key_p(c) > -a*key_kept(c) <=> key_p(c) < a*key_kept(c)
            dominated = point_keys[sel_rows] < alpha * kept_keys
        pruned[sel_rows] |= dominated
    return out


@partial(jax.jit, static_argnames=("metric_id", "l", "block"))
def _topl_scan(q, q_ids, corpus, n_real, *, metric_id, l, block):
    """Exact top-L neighbor candidates for a query chunk via a blocked scan.

    ``corpus`` is (Npad, D) zero-padded to a multiple of ``block``; padded
    rows are excluded by id. Runs as ONE dispatch: a fori_loop over corpus
    blocks, each a (B, block) matmul + top_k, with a carried (B, L) merge.
    metric_id: 0 = L2 (keys are -dist^2), 1 = dot (IP/cos on transformed
    rows). Self-matches (block id == q_id) are masked.
    """
    b = q.shape[0]
    npad = corpus.shape[0]
    nb = npad // block
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)

    def body(i, carry):
        keys, ids = carry
        lo = i * block
        blk = jax.lax.dynamic_slice_in_dim(corpus, lo, block, 0)
        ip = jax.lax.dot_general(
            q, blk.T, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric_id == 0:
            blk_sq = jnp.sum(blk * blk, axis=1)
            kb = -(q_sq + blk_sq[None, :] - 2.0 * ip)
        else:
            kb = ip
        bids = lo + jnp.arange(block, dtype=jnp.int32)
        kb = jnp.where(
            (bids[None, :] == q_ids[:, None]) | (bids[None, :] >= n_real),
            NEG_INF, kb)
        tk, ti = jax.lax.top_k(kb, l)
        allk = jnp.concatenate([keys, tk], axis=1)
        alli = jnp.concatenate([ids, jnp.take(bids, ti)], axis=1)
        mk, pos = jax.lax.top_k(allk, l)
        return mk, jnp.take_along_axis(alli, pos, axis=1)

    keys0 = jnp.full((b, l), NEG_INF)
    ids0 = jnp.full((b, l), -1, dtype=jnp.int32)
    keys, ids = jax.lax.fori_loop(0, nb, body, (keys0, ids0))
    return keys, ids


@partial(jax.jit, static_argnames=("r", "descending"))
def _robust_prune_dev(point_keys, pair_keys, cand_ids, alpha, *, r, descending):
    """Device-side batched alpha-prune — the vectorized Vamana robust prune
    (reference: diskann.rs:820-875) as a fori_loop over candidate ranks.
    Same key-space semantics as :func:`robust_prune_batch` (which remains
    the host/numpy twin used by small repair paths)."""
    bs, l = point_keys.shape
    order = jnp.argsort(-point_keys, axis=1)
    pruned = (cand_ids < 0) | ~jnp.isfinite(point_keys)
    out = jnp.full((bs, r), -1, dtype=jnp.int32)
    out_n = jnp.zeros((bs,), dtype=jnp.int32)
    ln_alpha = jnp.log(jnp.maximum(alpha, 1.0))
    rows = jnp.arange(bs)

    def body(rank, st):
        pruned, out, out_n = st
        idx = order[:, rank]  # (BS,)
        active = (~pruned[rows, idx]) & (out_n < r)
        sel = cand_ids[rows, idx].astype(jnp.int32)
        slot = jnp.minimum(out_n, r - 1)
        out = out.at[rows, slot].set(jnp.where(active, sel, out[rows, slot]))
        pruned = pruned.at[rows, idx].set(pruned[rows, idx] | active)
        kept_keys = pair_keys[rows, idx, :]  # (BS, L)
        if descending:
            dom = point_keys < kept_keys - ln_alpha
        else:
            dom = point_keys < alpha * kept_keys
        pruned = pruned | (dom & active[:, None])
        out_n = out_n + active.astype(jnp.int32)
        return pruned, out, out_n

    pruned, out, out_n = jax.lax.fori_loop(0, l, body, (pruned, out, out_n))
    return out


@partial(jax.jit, static_argnames=("metric", "r", "descending"))
def prune_gathered(node_rows, cand_rows, node_ids, cand_ids, alpha, *,
                   metric, r, descending):
    """Alpha-prune over PRE-GATHERED candidate rows — the streaming-corpus
    twin of :func:`_prune_chunk_kernel`. The caller gathers only the
    (BS, L, D) candidate rows from the host mirror (nothing corpus-sized is
    staged), so in-place graph maintenance works while the full f32 corpus
    exceeds the device budget (reference: IP-DiskANN inserts run against
    the on-disk graph the same way, diskann.rs:1496)."""
    point_keys = jax.vmap(
        lambda qq, xx: _keyed_pairwise(qq[None], xx, metric)[0]
    )(node_rows, cand_rows)
    bad = (cand_ids < 0) | (cand_ids == node_ids[:, None])
    point_keys = jnp.where(bad, NEG_INF, point_keys)
    pair_keys = jax.vmap(lambda xx: _keyed_pairwise(xx, xx, metric))(cand_rows)
    return _robust_prune_dev(
        point_keys, pair_keys, jnp.where(bad, -1, cand_ids),
        alpha, r=r, descending=descending)


@partial(jax.jit, static_argnames=("metric", "r", "descending"))
def _prune_chunk_kernel(corpus, node_ids, cand_ids, alpha, *, metric, r, descending):
    """One-dispatch candidate prune for a node chunk: gathers rows, computes
    point/pair keys in f32 on the MXU, runs the device alpha-prune. Returns
    only the (BS, r) int32 adjacency — nothing bulky crosses the tunnel."""
    node_rows = corpus[jnp.maximum(node_ids, 0)]  # (BS, D)
    safe = jnp.maximum(cand_ids, 0)
    cand_rows = corpus[safe]  # (BS, L, D)
    point_keys = jax.vmap(
        lambda qq, xx: _keyed_pairwise(qq[None], xx, metric)[0]
    )(node_rows, cand_rows)
    bad = (cand_ids < 0) | (cand_ids == node_ids[:, None])
    point_keys = jnp.where(bad, NEG_INF, point_keys)
    pair_keys = jax.vmap(lambda xx: _keyed_pairwise(xx, xx, metric))(cand_rows)
    return _robust_prune_dev(
        point_keys, pair_keys, jnp.where(bad, -1, cand_ids),
        alpha, r=r, descending=descending)


def _reverse_candidates(forward: np.ndarray, n: int, width: int) -> np.ndarray:
    """(N, width) reverse-edge requesters per node. Capping is deterministic
    first-come by forward-edge order (no random subsampling)."""
    r = forward.shape[1]
    flat_pts = np.repeat(np.arange(forward.shape[0], dtype=np.int64), r)
    flat_nbrs = forward.ravel().astype(np.int64)
    ok = (flat_nbrs >= 0) & (flat_nbrs < n)
    pts, nbrs = flat_pts[ok], flat_nbrs[ok]
    out = np.full((n, width), -1, dtype=np.int32)
    if len(nbrs) == 0:
        return out
    order = np.argsort(nbrs, kind="stable")
    pts, nbrs = pts[order], nbrs[order]
    uniq, group_start, counts = np.unique(nbrs, return_index=True, return_counts=True)
    rank = np.arange(len(nbrs)) - np.repeat(group_start, counts)
    keep = rank < width
    out[nbrs[keep], rank[keep]] = pts[keep]
    return out


def _construction_space(metric: Metric, rows):
    """Graph CONSTRUCTION geometry. For inner product the alpha-RNG prune
    has no triangle inequality to create long-range navigable edges — even
    with the log-space alpha rule the built graph is cluster-local and beam
    recall collapses (measured 0.215 on clustered unit-norm data). The
    navigable MIPS graph is ANGULAR: L2 over row-normalized vectors; the
    query-time beam runs under IP with high-norm entry points and finds the
    norm-weighted winners inside the angular neighborhoods (measured 1.0 /
    0.95 / 0.97 on gaussian-MIPS / unit-norm / raw clustered vs 0.62-0.21
    for the alternatives). The adjacency itself is metric-agnostic."""
    if metric is Metric.IP:
        norms = jnp.linalg.norm(rows, axis=1, keepdims=True)
        return Metric.L2, rows / jnp.maximum(norms, 1e-30)
    return metric, rows


def build_vamana(
    corpus_rows: "jnp.ndarray",
    metric: Metric,
    *,
    r: int = 16,
    l_build: int = 64,
    alpha: float = 1.2,
    seed: int = 42,
    passes: int = 2,
    batch: int = 1024,
    chunk: int = 4096,
) -> np.ndarray:
    """TPU-native Vamana-quality construction (replaces the reference's
    sequential batched-insert build, diskann.rs:798-1084, with a formulation
    that has no insert-order dependency chain):

      1. exact top-``l_build`` neighbor candidates for EVERY node via blocked
         MXU matmul scans (one dispatch per 4k-node chunk) — strictly better
         candidate sets than the insert-time beam searches the reference uses;
      2. device-side batched alpha robust-prune of each node's candidates
         (+ a few random long-range candidates for navigability) -> forward
         edges;
      3. forward ∪ reverse candidate merge, re-pruned on device (the
         reference's reverse-edge insert + overflow re-prune, done for all
         nodes at once).

    Returns (N, r) int32 adjacency, -1 padded. ``passes``/``batch`` are
    retained for API compatibility (the construction is single-shot)."""
    del passes, batch
    metric, corpus_rows = _construction_space(metric, corpus_rows)
    n = int(corpus_rows.shape[0])
    rng = np.random.default_rng(seed)
    if n <= r + 1:
        graph = np.full((n, r), -1, dtype=np.int32)
        for i in range(n):
            others = [j for j in range(n) if j != i]
            graph[i, : len(others)] = others
        return graph

    l = max(l_build, 2 * r)
    n_rand = min(8, max(n - l - 1, 0))
    cand_ids = knn_candidates(corpus_rows, metric, l=l, chunk=chunk)

    descending = not metric.ascending
    corpus_dev = corpus_rows if isinstance(corpus_rows, jnp.ndarray) else jnp.asarray(corpus_rows)

    # pass A: forward edges from (exact kNN + random long-range) candidates
    forward = np.empty((n, r), dtype=np.int32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        ids_np = np.arange(lo, hi, dtype=np.int32)
        cands = cand_ids[lo:hi]
        if n_rand:
            extra = rng.integers(0, n, size=(m, n_rand), dtype=np.int64).astype(np.int32)
            cands = np.concatenate([cands, extra], axis=1)
        if m < chunk:  # pad the last chunk to the compiled shape
            ids_np = np.concatenate([ids_np, np.full(chunk - m, -1, np.int32)])
            cands = np.concatenate(
                [cands, np.full((chunk - m, cands.shape[1]), -1, np.int32)])
        pruned = _prune_chunk_kernel(
            corpus_dev, jnp.asarray(ids_np), jnp.asarray(cands),
            jnp.float32(alpha), metric=metric, r=r, descending=descending)
        forward[lo:hi] = np.asarray(pruned)[:m]

    # pass B: merge reverse edges and re-prune every node once
    rev = _reverse_candidates(forward, n, width=r)
    graph = np.empty((n, r), dtype=np.int32)
    width = 2 * r
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        ids_np = np.arange(lo, hi, dtype=np.int32)
        cands = np.concatenate([forward[lo:hi], rev[lo:hi]], axis=1)
        _mask_dup_cands(cands)
        if m < chunk:
            ids_np = np.concatenate([ids_np, np.full(chunk - m, -1, np.int32)])
            cands = np.concatenate(
                [cands, np.full((chunk - m, width), -1, np.int32)])
        pruned = _prune_chunk_kernel(
            corpus_dev, jnp.asarray(ids_np), jnp.asarray(cands),
            jnp.float32(alpha), metric=metric, r=r, descending=descending)
        graph[lo:hi] = np.asarray(pruned)[:m]
    return graph


def _mask_dup_cands(cands: np.ndarray) -> None:
    """In-place: set duplicate candidate ids within each row to -1 (keeps the
    first occurrence). Vectorized — no per-row Python loops."""
    srt_idx = np.argsort(cands, axis=1, kind="stable")
    srt = np.take_along_axis(cands, srt_idx, axis=1)
    dup_sorted = np.zeros_like(srt, dtype=bool)
    dup_sorted[:, 1:] = (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0)
    dup = np.zeros_like(cands, dtype=bool)
    np.put_along_axis(dup, srt_idx, dup_sorted, axis=1)
    cands[dup] = -1


def knn_candidates(corpus_rows, metric: Metric, *, l: int,
                   chunk: int = 4096, block: int = 131072) -> np.ndarray:
    """Exact top-``l`` neighbors (construction space) for every row, via
    :func:`_topl_scan` over corpus blocks. Returns (N, l) int32, -1 padded.
    ``corpus_rows`` must already be in construction space."""
    rows = corpus_rows if isinstance(corpus_rows, jnp.ndarray) else jnp.asarray(corpus_rows)
    n, d = rows.shape
    l_eff = min(l, n - 1)
    block = min(block, max(((n + 1023) // 1024) * 1024, 1024))
    npad = ((n + block - 1) // block) * block
    if npad != n:
        rows_pad = jnp.zeros((npad, d), dtype=rows.dtype).at[:n].set(rows)
    else:
        rows_pad = rows
    fast = metric in (Metric.L2, Metric.IP, Metric.COSINE)
    if metric is Metric.L2:
        metric_id = 0
        q_src = rows_pad
    elif metric is Metric.COSINE:
        metric_id = 1
        norms = jnp.linalg.norm(rows_pad, axis=1, keepdims=True)
        q_src = rows_pad / jnp.maximum(norms, 1e-30)
        rows_pad = q_src
    elif metric is Metric.IP:
        metric_id = 1
        q_src = rows_pad
    out = np.full((n, l), -1, dtype=np.int32)
    n_dev = jnp.int32(n)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        q_ids = np.full(chunk, -2, dtype=np.int32)
        q_ids[:m] = np.arange(lo, hi, dtype=np.int32)
        take = np.zeros(chunk, dtype=np.int64)
        take[:m] = np.arange(lo, hi)
        q = rows_pad[jnp.asarray(take)] if not fast else (
            q_src[jnp.asarray(take)])
        if fast:
            keys, ids = _topl_scan(
                q, jnp.asarray(q_ids), rows_pad, n_dev, metric_id=metric_id,
                l=l_eff, block=block)
        else:
            keys, ids = _topl_generic(
                q, jnp.asarray(q_ids), rows_pad, n_dev, metric=metric,
                l=l_eff, block=block)
        ids = np.array(ids)
        keys = np.asarray(keys)
        ids[~np.isfinite(keys)] = -1
        ids[ids >= n] = -1
        out[lo:hi, :l_eff] = ids[:m]
    return out


@partial(jax.jit, static_argnames=("metric", "l", "block"))
def _topl_generic(q, q_ids, corpus, n_real, *, metric: Metric, l, block):
    """Generic-metric twin of :func:`_topl_scan` for the domain metrics the
    graph families also serve (HNSW-L1/-CHEBYSHEV/... in the reference's
    mode list): same blocked top-L merge, distances via the full metric
    registry."""
    b = q.shape[0]
    nb = corpus.shape[0] // block

    def body(i, carry):
        keys, ids = carry
        lo = i * block
        blk = jax.lax.dynamic_slice_in_dim(corpus, lo, block, 0)
        kb = _keyed_pairwise(q, blk, metric)
        bids = lo + jnp.arange(block, dtype=jnp.int32)
        kb = jnp.where(
            (bids[None, :] == q_ids[:, None]) | (bids[None, :] >= n_real),
            NEG_INF, kb)
        tk, ti = jax.lax.top_k(kb, l)
        allk = jnp.concatenate([keys, tk], axis=1)
        alli = jnp.concatenate([ids, jnp.take(bids, ti)], axis=1)
        mk, pos = jax.lax.top_k(allk, l)
        return mk, jnp.take_along_axis(alli, pos, axis=1)

    keys0 = jnp.full((b, l), NEG_INF)
    ids0 = jnp.full((b, l), -1, dtype=jnp.int32)
    return jax.lax.fori_loop(0, nb, body, (keys0, ids0))


def _link_points_batch(graph: np.ndarray, graph_dev, ids: np.ndarray,
                       corpus_rows, starts, valid, *, metric: Metric, r: int,
                       l_build: int, alpha: float, batch: int):
    """Link one batch of points into the graph: batched beam search for
    candidates, alpha robust-prune for the points' own lists, reverse edges
    into the chosen neighbors with overflow re-prune (reference:
    diskann.rs:1084 parallel build step / :1496 in-place insert).

    ``graph_dev`` is the device-resident adjacency; only the rows this batch
    mutates are scattered back (re-uploading the whole (N, R) graph per batch
    was ~128 MB x ~2000 batches at 1M rows — the entire build cost).
    Returns the updated ``graph_dev``."""
    ids = np.asarray(ids, dtype=np.int64)
    pad = batch - len(ids)
    q_ids = np.concatenate([ids, np.zeros(pad, dtype=ids.dtype)]) if pad > 0 else ids
    q = corpus_rows[jnp.asarray(q_ids)]
    keys, cands, _ = beam_search(
        q, corpus_rows, graph_dev, starts, valid,
        metric=metric, beam=l_build, max_steps=l_build * 2, k=l_build,
        # construction always uses single-expansion best-first: wider
        # expansion measurably degrades candidate quality (0.975 vs 0.912
        # recall on the toy A/B) and build edges persist to disk, so the
        # LYNSE_TPU_BEAM_EXPAND search knob must never leak into builds
        expand=1,
    )
    keys = np.asarray(keys)
    cands = np.asarray(cands)
    # drop self-candidates
    self_mask = cands == q_ids[:, None]
    cands = np.where(self_mask, -1, cands)
    keys = np.where(self_mask, -np.inf, keys)
    rows = corpus_rows[jnp.asarray(np.maximum(cands, 0))]
    pair = np.asarray(candidate_pair_keys(rows, metric))
    pruned = robust_prune_batch(keys, pair, cands, alpha, r,
                                descending=not metric.ascending)
    if pad > 0:
        pruned = pruned[: len(ids)]
    graph[ids] = pruned.astype(np.int32)
    # reverse edges: the point joins each chosen neighbor's list; nodes whose
    # lists overflow get a batched alpha re-prune (reference keeps graphs
    # healthy the same way: prune on overflow, diskann.rs)
    touched: set[int] = set(int(x) for x in ids)
    overflow: dict[int, list[int]] = {}
    placed: set[int] = set()
    # vectorized reverse-edge placement: group (point -> nbr) pairs by nbr,
    # rank within each group, and scatter rank-th points into the nbr's
    # rank-th free slot in one fancy assignment (the per-pair Python loop
    # this replaces cost ~32k iterations per build batch)
    flat_pts = np.repeat(ids, pruned.shape[1])
    flat_nbrs = pruned.ravel().astype(np.int64)
    ok = flat_nbrs >= 0
    pts, nbrs = flat_pts[ok], flat_nbrs[ok]
    if len(nbrs):
        order = np.argsort(nbrs, kind="stable")
        pts, nbrs = pts[order], nbrs[order]
        uniq, group_start, counts = np.unique(nbrs, return_index=True, return_counts=True)
        rank = np.arange(len(nbrs)) - np.repeat(group_start, counts)
        u_of_pair = np.repeat(np.arange(len(uniq)), counts)
        rows_u = graph[uniq]  # (U, r) snapshot
        free_counts = (rows_u < 0).sum(axis=1)
        # free slots first, in stable order: argsort(occupied) per row
        slot_pos = np.argsort(rows_u >= 0, axis=1, kind="stable")
        fits = rank < free_counts[u_of_pair]
        if fits.any():
            tgt_nbrs = nbrs[fits]
            tgt_slots = slot_pos[u_of_pair[fits], rank[fits]]
            graph[tgt_nbrs, tgt_slots] = pts[fits]
            placed.update(int(p) for p in pts[fits])
            touched.update(int(x) for x in tgt_nbrs)
        for p, nb in zip(pts[~fits], nbrs[~fits]):
            overflow.setdefault(int(nb), []).append(int(p))
    if overflow:
        _reprune_nodes(graph, overflow, corpus_rows, metric, alpha, r)
        touched.update(overflow.keys())
        for node, reqs in overflow.items():
            survivors = set(int(x) for x in graph[node] if x >= 0)
            placed.update(req for req in reqs if req in survivors)
    # reachability floor: a point whose reverse edges were all alpha-pruned
    # (an outlier) gets a forced back-edge from its closest neighbor — else
    # it has in-degree 0 and the beam can never discover it (the reference's
    # sequential insert_point keeps at least the bidirectional link too)
    for row_i, point in enumerate(ids):
        if int(point) in placed:
            continue
        nearest = next((int(x) for x in pruned[row_i] if x >= 0), -1)
        if nearest >= 0:
            graph[nearest, r - 1] = point
            touched.add(nearest)
    # scatter only the mutated rows into the device copy, padded to a
    # bucketed count (duplicate indices re-set the same values — harmless)
    # so the scatter compiles for a handful of shapes, not one per batch
    rows = np.fromiter(touched, dtype=np.int64, count=len(touched))
    size = max(((len(rows) + 8191) // 8192) * 8192, 8192)
    if size != len(rows):
        rows = np.concatenate([rows, np.full(size - len(rows), rows[0], dtype=np.int64)])
    return graph_dev.at[jnp.asarray(rows)].set(jnp.asarray(graph[rows]))


def insert_points(graph: np.ndarray, new_ids: np.ndarray, corpus_rows,
                  starts, live_mask: np.ndarray, *, metric: Metric, r: int,
                  l_build: int, alpha: float, batch: int = 1024) -> np.ndarray:
    """In-place insert (IP-DiskANN, reference diskann.rs:1496): grow the
    adjacency to cover ``corpus_rows`` and link each new point with the
    batched build step. Returns the (possibly reallocated) graph."""
    metric, corpus_rows = _construction_space(metric, corpus_rows)
    n_new_total = int(corpus_rows.shape[0])
    if n_new_total > graph.shape[0]:
        grown = np.full((n_new_total, graph.shape[1]), -1, dtype=np.int32)
        grown[: graph.shape[0]] = graph
        graph = grown
    valid = jnp.asarray(live_mask[:n_new_total])
    graph_dev = jnp.asarray(graph)
    for i in range(0, len(new_ids), batch):
        graph_dev = _link_points_batch(
            graph, graph_dev, new_ids[i : i + batch], corpus_rows, starts,
            valid, metric=metric, r=r, l_build=l_build,
            alpha=alpha, batch=min(batch, 1024))
    return graph


def repair_deleted_edges(graph: np.ndarray, deleted_mask: np.ndarray,
                         corpus_rows, *, metric: Metric, r: int, alpha: float,
                         batch: int = 1024) -> int:
    """Delete repair (IP-DiskANN, reference diskann.rs:1337 + Alg-6
    consolidation :502-560): every live node with an edge into a deleted
    node replaces it with pruned candidates drawn from its own list plus the
    deleted nodes' out-neighborhoods, so connectivity survives the removal.
    Deleted nodes' own lists are cleared. Returns #nodes repaired."""
    metric, corpus_rows = _construction_space(metric, corpus_rows)
    n = graph.shape[0]
    dm = np.zeros(n, dtype=bool)
    dm[: min(len(deleted_mask), n)] = deleted_mask[: min(len(deleted_mask), n)]
    if not dm.any():
        return 0
    safe = np.maximum(graph, 0)
    edge_to_deleted = (graph >= 0) & dm[safe]
    affected = np.nonzero(edge_to_deleted.any(axis=1) & ~dm)[0]
    c_width = 3 * r
    for i in range(0, len(affected), batch):
        chunk = affected[i : i + batch]
        m = len(chunk)
        # bucketed padding keeps the compiled-shape set tiny (see
        # _reprune_nodes); pad rows are all -1 and never written back
        m_pad = next(s for s in (64, 256, batch) if m <= s) if m <= batch else m
        chunk_pad = np.concatenate([chunk, np.zeros(m_pad - m, np.int64)]) if m_pad != m else chunk
        cands = np.full((m_pad, c_width), -1, dtype=np.int64)
        for row_i, node in enumerate(chunk):
            kept, stitched = [], []
            for nbr in graph[node]:
                if nbr < 0:
                    continue
                if dm[nbr]:
                    # stitch through the deleted neighbor's out-list
                    stitched.extend(int(x) for x in graph[nbr] if x >= 0 and not dm[x] and x != node)
                else:
                    kept.append(int(nbr))
            merged, seen = [], set()
            for x in kept + stitched:
                if x not in seen:
                    seen.add(x)
                    merged.append(x)
            cands[row_i, : min(len(merged), c_width)] = merged[:c_width]
        node_rows = corpus_rows[jnp.asarray(chunk_pad)]
        cand_rows = corpus_rows[jnp.asarray(np.maximum(cands, 0))]
        point_keys = np.asarray(
            jax.vmap(lambda qq, xx: _keyed_pairwise(qq[None], xx, metric)[0])(
                node_rows, cand_rows
            )
        )
        point_keys = np.where(cands >= 0, point_keys, -np.inf)
        pair = np.asarray(candidate_pair_keys(cand_rows, metric))
        pruned = robust_prune_batch(point_keys, pair, cands, alpha, r,
                                    descending=not metric.ascending)
        graph[chunk] = pruned[:m].astype(np.int32)
    graph[dm] = -1
    return len(affected)


def reconnect_orphans(graph: np.ndarray, live_mask: np.ndarray, corpus_rows,
                      starts, *, metric: Metric, r: int, l_build: int,
                      alpha: float) -> int:
    """Re-link live nodes with zero in-degree (restored-from-tombstone rows
    or stitching casualties) so they stay reachable. Returns #relinked."""
    n = graph.shape[0]
    flat = graph[graph >= 0]
    indeg = np.bincount(flat, minlength=n) if len(flat) else np.zeros(n, dtype=np.int64)
    live = np.zeros(n, dtype=bool)
    live[: min(len(live_mask), n)] = live_mask[: min(len(live_mask), n)]
    orphans = np.nonzero(live & (indeg == 0))[0]
    orphans = orphans[~np.isin(orphans, np.asarray(starts))]
    if len(orphans) == 0:
        return 0
    insert_points(graph, orphans, corpus_rows, starts, live,
                  metric=metric, r=r, l_build=l_build, alpha=alpha)
    return len(orphans)


def _reprune_nodes(graph: np.ndarray, overflow: dict[int, list[int]],
                   corpus_rows, metric: Metric, alpha: float, r: int,
                   batch: int = 1024) -> None:
    """Batched alpha re-prune of nodes whose adjacency overflowed with
    reverse edges: candidates = current neighbors + pending requests."""
    nodes = np.fromiter(overflow.keys(), dtype=np.int64)
    c_width = 2 * r
    for i in range(0, len(nodes), batch):
        chunk = nodes[i : i + batch]
        m = len(chunk)
        # pad the node count to one of THREE shapes: the overflow count
        # varies every build batch, and an unpadded chunk compiles a fresh
        # executable per distinct length (measured: ~21 compiles/batch — on
        # a dev tunnel each one is a server-side compile)
        m_pad = next(s for s in (64, 256, batch) if m <= s) if m <= batch else m
        chunk_pad = np.concatenate([chunk, np.zeros(m_pad - m, np.int64)]) if m_pad != m else chunk
        cands = np.full((m_pad, c_width), -1, dtype=np.int64)
        for row_i, node in enumerate(chunk):
            merged = [x for x in graph[node] if x >= 0]
            for req in overflow[int(node)]:
                if req not in merged and req != node:
                    merged.append(req)
            cands[row_i, : min(len(merged), c_width)] = merged[:c_width]
        node_rows = corpus_rows[jnp.asarray(chunk_pad)]
        cand_rows = corpus_rows[jnp.asarray(np.maximum(cands, 0))]
        point_keys = np.asarray(
            jax.vmap(lambda qq, xx: _keyed_pairwise(qq[None], xx, metric)[0])(
                node_rows, cand_rows
            )
        )
        point_keys = np.where(cands >= 0, point_keys, -np.inf)
        pair = np.asarray(candidate_pair_keys(cand_rows, metric))
        pruned = robust_prune_batch(point_keys, pair, cands, alpha, r,
                                    descending=not metric.ascending)
        # pad rows produce all -1 lists; only real nodes are written back
        graph[chunk] = pruned[:m].astype(np.int32)


@partial(jax.jit, static_argnames=("metric", "take"))
def _knn_block(q_rows, rows, lo, *, metric: Metric, take: int):
    keys = _keyed_pairwise(q_rows, rows, metric)  # (b, n)
    b = q_rows.shape[0]
    cols = lo + jnp.arange(b)  # self columns for this block
    # mode="drop": padded tail rows point past n — skip, their output is cut
    keys = keys.at[jnp.arange(b), cols].set(-jnp.inf, mode="drop")
    _, idx = jax.lax.top_k(keys, take)
    return idx.astype(jnp.int32)


def exact_knn_graph(rows: "jnp.ndarray", metric: Metric, r: int, block: int = 2048) -> np.ndarray:
    """Exact kNN graph for upper HNSW layers, computed in query blocks so the
    (n, n) key matrix never materializes on the device or crosses the wire —
    a 31k-node layer-1 subsample at 1M rows would otherwise allocate two
    ~4 GB buffers and OOM the chip. Only the (b, take) index block returns."""
    n = rows.shape[0]
    take = min(r, n - 1)
    out = np.full((n, r), -1, dtype=np.int32)
    if take <= 0:
        return out
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        q = rows[lo:hi]
        if hi - lo < block and n > block:
            # pad the ragged tail to the bucket shape: one executable total
            q = jnp.concatenate([q, jnp.zeros((block - (hi - lo), rows.shape[1]), rows.dtype)])
        idx = _knn_block(q, rows, lo, metric=metric, take=take)
        out[lo:hi, :take] = np.asarray(idx)[: hi - lo]
    return out


def fetch_pool_scanned(pool, scanned) -> tuple[np.ndarray, int]:
    """One host sync for a beam's (pool ids, scanned counters).

    Fetching them separately costs two transport round trips (~33 ms each
    through the serving tunnel — benchmarks/dispatch_floor_r05.log), and the
    second one pays it for a PROFILE figure. Concatenating on device makes
    the whole result one fetch. Returns (ids (B, P) int64, max scanned)."""
    packed = np.asarray(jnp.concatenate(
        [pool.astype(jnp.int32), scanned.astype(jnp.int32)[:, None]], axis=1))
    return packed[:, :-1].astype(np.int64), int(packed[:, -1].max(initial=0))


def fetch_keys_pool_scanned(keys, ids, scanned) -> tuple[np.ndarray, np.ndarray, int]:
    """One host sync for an exact beam's (keys, ids, scanned). ids ride as
    hi/lo f32 lanes (exact for ids up to 2^36 — plain f32 lanes corrupt row
    ids past 2^24, i.e. >16.7M-row corpora); scanned is a telemetry counter
    where f32 rounding past 2^24 is immaterial."""
    idsi = ids.astype(jnp.int32)
    packed = np.asarray(jnp.concatenate(
        [keys.astype(jnp.float32),
         (idsi >> 12).astype(jnp.float32),
         (idsi & 0xFFF).astype(jnp.float32),
         scanned.astype(jnp.float32)[:, None]], axis=1))
    p = ids.shape[1]
    hi = packed[:, p : 2 * p].astype(np.int64)
    lo = packed[:, 2 * p : 3 * p].astype(np.int64)
    return packed[:, :p], (hi << 12) | lo, int(packed[:, -1].max(initial=0))
