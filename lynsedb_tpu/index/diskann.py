"""DiskANN-style Vamana index, TPU-native.

Reference behavior: src/index/diskann.rs — Vamana build (random init :798,
robust-prune passes :830/:1025, parallel batched build :1084), beam search
:602, in-place insert/delete repair (IP-DiskANN, :1337/:1496). The TPU build
keeps the full graph on device as a dense (N, R) int32 adjacency and runs the
batched beam kernel in :mod:`lynsedb_tpu.ops.graph`.

Layered mode (reference: diskann.rs:276 flush_layered + :602 search_graph_pq
+ uses_store_rescore -> vector_store.rs:611): past LAYERED_MIN_ROWS the beam
is PQ-guided — HBM holds only the adjacency plus (N, M) uint8 PQ codes, the
beam scores neighbors from a per-query ADC LUT, and the pool is exact-
rescored from the host f32 mirror. Graph search therefore keeps working when
the f32 corpus exceeds the device budget (HBM plays the role of the SSD
tier for the graph; the host mirror plays the role of the on-disk exact
rows).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..metrics import Metric
from ..ops.graph import (
    beam_search,
    beam_search_bf16,
    beam_search_pq,
    beam_search_sq8,
    build_vamana,
    entry_sample_ids,
    entry_scan,
    fetch_keys_pool_scanned,
    fetch_pool_scanned,
    insert_points,
    prune_gathered,
    reconnect_orphans,
    repair_deleted_edges,
)
from ..ops.quantize import PQ, SQ8
from ..storage.vector_store import write_atomic

DEFAULT_R = 32
DEFAULT_L = 96
DEFAULT_ALPHA = 1.2
# In-place insert/delete repair is the update mechanism (reference
# IP-DiskANN, diskann.rs:1337/:1496); a full rebuild is only the backstop
# once accumulated churn passes this fraction of the built corpus.
REBUILD_CHURN_FRACTION = 0.5
# Past this row count search goes layered/PQ-guided (the reference flips to
# the disk graph + PQ codes for the None/PQ quantizer, diskann.rs:276).
LAYERED_MIN_ROWS = int(os.environ.get("LYNSE_TPU_DISKANN_LAYERED_MIN_ROWS", "200000"))
PQ_FIT_SAMPLE = 131072
_PQ_METRIC_KIND = {Metric.IP: "ip", Metric.L2: "l2", Metric.COSINE: "cos"}


def _beam_batch_cap(n: int) -> int:
    """Largest query sub-batch for the beam kernels over an n-row graph.
    Each beam walk carries a per-query (b, n) bool visited bitmap on
    device; at streaming scale (n only exists because the corpus exceeds
    the HBM budget) an uncapped b=1024 batch would alone need ~n KB —
    more than the whole budget. Cap the bitmap to 1/8 of the budget and
    floor at 16 (16*n bytes is within budget whenever the graph itself
    — r int32s per row — fits, which the device-resident plane already
    requires)."""
    from ..ops import scan as _scan

    budget = max(int(_scan.HBM_BYTES) // 8, 1)
    for b in (1024, 256, 64):
        if b * n <= budget:
            return b
    return 16


def _exceeds_hbm(n: int, dim: int) -> bool:
    """Whether an (n, dim) bf16 scan array would stream (>HBM budget)."""
    from ..ops import scan as _scan

    return n * dim * 2 > _scan.HBM_BYTES


class DiskANNIndex:
    kind = "diskann"

    def __init__(self, coll, mode, opts, graph: np.ndarray, medoid: int, built_rows: int,
                 r: int, l: int, alpha: float, starts: np.ndarray | None = None):
        self.mode = mode
        self.metric: Metric = mode.metric
        self.graph_np = graph
        self.medoid = int(medoid)
        self.built_rows = int(built_rows)
        self.r = r
        self.l = l
        self.alpha = alpha
        self._starts_np = starts if starts is not None else np.asarray([medoid], dtype=np.int32)
        self._graph_dev = None
        self._entry_dev = None  # (sample_ids, sample_rows) for entry_scan
        # rows committed while the corpus streamed that could not be linked
        # (non-layered legacy); set here so rebuild()'s __dict__.update
        # always resets it — stale ids must not survive a rebuild/compact
        self._unlinked_ids = np.empty(0, dtype=np.int64)
        # layered-mode artifacts (None when not layered)
        self.pq: Optional[PQ] = None
        self.pq_codes: Optional[np.ndarray] = None  # (built_rows, M) uint8
        self.pq_alpha: Optional[np.ndarray] = None  # (built_rows,) f32 row scale
        self.pq_row_sq: Optional[np.ndarray] = None  # (built_rows,) f32 TRUE norms^2
        self._pq_dev = None  # (codes, codebooks, alpha, row_sq) device tuple
        # SQ8 middle guidance tier (1 byte/dim; see ops/graph.beam_search_sq8)
        self.sq8_codes: Optional[np.ndarray] = None  # (built_rows, D) int8
        self.sq8_lo: Optional[np.ndarray] = None  # (D,)
        self.sq8_scale: Optional[np.ndarray] = None  # (D,)
        self._sq8_dev = None  # (codes, lo, scale, row_sq) device tuple

    # ── build ────────────────────────────────────────────────────────────

    @classmethod
    def build(cls, coll, mode, opts) -> "DiskANNIndex":
        data = coll.store.read_all()
        n = data.shape[0]
        if n == 0:
            raise ValueError("cannot build a DiskANN index on an empty collection")
        r = opts.r or DEFAULT_R
        l = opts.l or DEFAULT_L
        alpha = float(opts.alpha or DEFAULT_ALPHA)
        if opts.max_degree:
            r = min(r, opts.max_degree)
        rows = jnp.asarray(data)
        graph = build_vamana(rows, mode.metric, r=r, l_build=l, alpha=alpha)
        medoid = int(np.asarray(jnp.argmin(jnp.sum((rows - rows.mean(0)) ** 2, axis=1))))
        idx = cls(coll, mode, opts, graph, medoid, n, r, l, alpha)
        idx._starts_np = idx._compute_starts(data)
        if mode.metric in _PQ_METRIC_KIND and (
            n >= LAYERED_MIN_ROWS or _exceeds_hbm(n, data.shape[1])
        ):
            # PQ codes are also required whenever the corpus streams (>HBM
            # budget): the beam has no resident array to score from, so even
            # a small-row corpus under a tiny budget needs the layered tier
            idx._fit_pq(data)
        idx.save(coll)
        return idx

    def _fit_pq(self, data: np.ndarray) -> None:
        """Train + encode the layered-mode guidance artifacts (diskann.rs:276
        flush_layered writes graph.bin + pq.bin; here the codes stay
        device-stageable numpy).

        Fits BOTH sub-bf16 guidance tiers: SQ8 codes (1 byte/dim — used
        whenever they fit the device budget) and PQ codes + alpha row-scale
        corrections + true row norms (the deepest tier, M bytes/row)."""
        data = np.asarray(data, dtype=np.float32)
        sample = data if len(data) <= PQ_FIT_SAMPLE else data[
            np.random.default_rng(7).choice(len(data), PQ_FIT_SAMPLE, replace=False)
        ]
        self.pq = PQ.fit(sample)
        self.pq_codes = self.pq.encode(data)
        dec = self.pq.decode(self.pq_codes)
        num = np.einsum("nd,nd->n", data, dec)
        den = np.einsum("nd,nd->n", dec, dec)
        self.pq_alpha = np.where(den > 0, num / np.maximum(den, 1e-30), 1.0).astype(np.float32)
        self.pq_row_sq = np.einsum("nd,nd->n", data, data).astype(np.float32)
        self._pq_dev = None
        sq = SQ8.fit(data)
        self.sq8_codes = sq.encode(data)
        self.sq8_lo = sq.lo
        self.sq8_scale = sq.scale
        self._sq8_dev = None

    @property
    def layered(self) -> bool:
        return self.pq_codes is not None

    def _pq_row_sq(self, codes: np.ndarray) -> np.ndarray:
        """Reconstructed squared norms: separable across subspaces."""
        books_sq = (self.pq.codebooks ** 2).sum(axis=2)  # (M, 256)
        return np.take_along_axis(
            books_sq.T, codes.astype(np.int64), axis=0
        ).sum(axis=1).astype(np.float32)

    def _starts_from_sample(self, rows: np.ndarray, ids: np.ndarray) -> np.ndarray:
        """Entry-point refresh from (rows, ids) of live rows (post-delete):
        sets the medoid and returns the starts array (medoid + top-norm
        rows for IP). Shared by the resident and streaming commit paths so
        the seeding policy lives in exactly one place."""
        centroid = rows.mean(axis=0)
        self.medoid = int(ids[np.argmin(((rows - centroid) ** 2).sum(1))])
        starts = [self.medoid]
        if self.metric is Metric.IP:
            norms = np.linalg.norm(rows, axis=1)
            starts.extend(int(x) for x in ids[np.argsort(-norms)[:4]])
        return np.unique(np.asarray(starts, dtype=np.int32))

    def _compute_starts(self, data: np.ndarray) -> np.ndarray:
        """Entry points: the medoid plus, for inner-product search, the
        highest-norm rows (MIPS winners concentrate at large norms — the same
        reason the reference ships a dedicated IP-DiskANN path)."""
        starts = [self.medoid]
        if self.metric is Metric.IP:
            norms = np.linalg.norm(data, axis=1)
            starts.extend(np.argsort(-norms)[:4].tolist())
        return np.unique(np.asarray(starts, dtype=np.int32))

    # ── persistence ──────────────────────────────────────────────────────

    def save(self, coll) -> None:
        idx_dir = coll.root / "index"
        idx_dir.mkdir(parents=True, exist_ok=True)
        arrays = {"graph": self.graph_np, "starts": self._starts_np}
        if self.layered:
            arrays["pq_codes"] = self.pq_codes
            arrays["pq_codebooks"] = self.pq.codebooks
            if self.pq_alpha is not None:
                arrays["pq_alpha"] = self.pq_alpha
                arrays["pq_row_sq"] = self.pq_row_sq
            if self.sq8_codes is not None:
                arrays["sq8_codes"] = self.sq8_codes
                arrays["sq8_lo"] = self.sq8_lo
                arrays["sq8_scale"] = self.sq8_scale
        unl = np.asarray(getattr(self, "_unlinked_ids", ()), dtype=np.int64)
        if len(unl):
            arrays["unlinked"] = unl
        np.savez(idx_dir / "graph.npz", **arrays)
        write_atomic(
            idx_dir / "graph_meta.json",
            json.dumps(
                {
                    "kind": self.kind,
                    "medoid": self.medoid,
                    "built_rows": self.built_rows,
                    "r": self.r,
                    "l": self.l,
                    "alpha": self.alpha,
                }
            ).encode(),
        )

    @classmethod
    def load(cls, coll, mode, opts) -> Optional["DiskANNIndex"]:
        idx_dir = coll.root / "index"
        if not (idx_dir / "graph.npz").exists():
            return None
        meta = json.loads((idx_dir / "graph_meta.json").read_text())
        data = np.load(idx_dir / "graph.npz")
        starts = data["starts"] if "starts" in data.files else None
        idx = cls(coll, mode, opts, data["graph"], meta["medoid"], meta["built_rows"],
                  meta["r"], meta["l"], meta["alpha"], starts=starts)
        if "pq_codes" in data.files:
            idx.pq = PQ(data["pq_codebooks"])
            idx.pq_codes = data["pq_codes"]
            if "pq_alpha" in data.files:
                idx.pq_alpha = data["pq_alpha"]
                idx.pq_row_sq = data["pq_row_sq"]
            else:  # legacy layered index: uncorrected guidance
                idx.pq_alpha = np.ones(len(idx.pq_codes), dtype=np.float32)
                idx.pq_row_sq = idx._pq_row_sq(idx.pq_codes)
            if "sq8_codes" in data.files:
                idx.sq8_codes = data["sq8_codes"]
                idx.sq8_lo = data["sq8_lo"]
                idx.sq8_scale = data["sq8_scale"]
        if "unlinked" in data.files:
            idx._unlinked_ids = data["unlinked"]
        return idx

    # ── search ───────────────────────────────────────────────────────────

    def _graph(self):
        if self._graph_dev is None:
            self._graph_dev = jnp.asarray(self.graph_np)
        return self._graph_dev

    # 1M raw-MIPS sweep (scripts/diskann_1m_raw_diag.py, GATES r4 corpus):
    # sample 4096 -> 16384 lifted recall@10 0.865 -> 0.906 at beam=100 and
    # 0.932 at beam=128, while 32768 gained nothing further; the sample is
    # 8 MB on device and one tiny matmul per batch. ENTRY_TOP 16/32 moved
    # nothing (0.865 flat) — coverage, not fan-out, is what matters.
    ENTRY_SAMPLE = 16384
    ENTRY_TOP = 16  # >= k seeds: skewed-MIPS GT rows are mutually unreachable via the walk
    # For IP the random sample is UNIONED with the top-norm band: on
    # norm-skewed corpora the MIPS ground truth concentrates entirely in a
    # few high-norm rows scattered across angular clusters, and random
    # sample coverage (~82% on the skew fixture) caps recall no matter the
    # beam — pinning the band makes coverage of the hot rows exact.
    ENTRY_NORM_TOP = 4096

    def _entry_state(self, coll):
        """Fixed node sample for the per-query entry scan — device-resident
        regardless of layered mode, since the sample is tiny even when the
        full f32 corpus is not in HBM. For IP, includes the top-norm band."""
        if self._entry_dev is None:
            n = self.built_rows
            corpus = coll.corpus()
            ip = self.metric is Metric.IP
            ids = entry_sample_ids(
                n, self.ENTRY_SAMPLE,
                sq_norms=corpus.host_sq_norms() if ip else None,
                norm_top=self.ENTRY_NORM_TOP if ip else 0)
            # rows that joined while the corpus streamed have no graph edges
            # — pin them so the entry scan scores them exactly; padded to a
            # 4096 bucket (edge-repeat dups are harmless) to bound the
            # entry_scan shape churn
            unl = np.asarray(getattr(self, "_unlinked_ids", ()),
                             dtype=np.int64)
            unl = unl[unl < n]
            if len(unl):
                cap = 4096 * ((len(unl) + 4095) // 4096)
                u = np.pad(unl, (0, cap - len(unl)), mode="edge")
                ids = np.concatenate([ids.astype(np.int32),
                                      u.astype(np.int32)])
            rows = corpus.host_rows(ids.astype(np.int64)).astype(np.float32)
            self._entry_dev = (jnp.asarray(ids), jnp.asarray(rows))
        return self._entry_dev

    def _query_starts(self, coll, qj, live) -> jnp.ndarray:
        """(B, S) per-query entry points: sampled entry scan ∪ the global
        starts (medoid + high-norm rows for IP)."""
        ids_d, rows_d = self._entry_state(coll)
        per_q = entry_scan(qj, rows_d, ids_d, live,
                           metric=self.metric, s=self.ENTRY_TOP)
        fixed = jnp.broadcast_to(
            jnp.asarray(self._starts_np.astype(np.int32))[None, :],
            (per_q.shape[0], len(self._starts_np)))
        return jnp.concatenate([per_q, fixed], axis=1)

    def _pq_device(self):
        if self._pq_dev is None:
            codes = self.pq_codes
            alpha = self.pq_alpha if self.pq_alpha is not None else \
                np.ones(len(codes), dtype=np.float32)
            row_sq = self.pq_row_sq if self.pq_row_sq is not None else \
                self._pq_row_sq(codes)
            self._pq_dev = (
                jnp.asarray(codes),
                jnp.asarray(self.pq.codebooks),
                jnp.asarray(alpha),
                jnp.asarray(row_sq),
            )
        return self._pq_dev

    def _sq8_device(self):
        if self._sq8_dev is None:
            row_sq = self.pq_row_sq if self.pq_row_sq is not None else \
                self._pq_row_sq(self.pq_codes)
            self._sq8_dev = (
                jnp.asarray(self.sq8_codes),
                jnp.asarray(self.sq8_lo),
                jnp.asarray(self.sq8_scale),
                jnp.asarray(row_sq),
            )
        return self._sq8_dev

    def _sq8_fits_device(self) -> bool:
        """SQ8 guidance codes fit when they take at most SQ8_GUIDE_FRACTION
        of the HBM budget (adjacency, visited bitmaps, and streaming
        flat-scan block buffers share the device).

        The viable window is real but bounded: the corpus streams when its
        bf16 copy exceeds the budget (2 bytes/dim, ops/scan.HBM_BYTES), so
        SQ8 (1 byte/dim) covers corpora between ~0.5x and ~0.6x the budget
        in int8 bytes — at the 12 GB default that is roughly 47M-56M
        128-d rows; beyond that the beam falls to PQ codes."""
        if self.sq8_codes is None:
            return False
        from ..ops.scan import HBM_BYTES

        frac = float(os.environ.get("LYNSE_TPU_SQ8_GUIDE_FRACTION", "0.6"))
        return self.sq8_codes.nbytes <= int(HBM_BYTES * frac)

    def search(self, coll, q: np.ndarray, k: int, mask: Optional[np.ndarray], nprobe: int):
        metric = self.metric
        corpus = coll.corpus()
        beam = max(int(nprobe or 0), self.l, k)
        if metric is Metric.IP:
            # raw inner product needs a wider pool than L2 at equal recall
            # (MIPS winners ride norm x angle; the graph is angular): +25%
            # beam measured 0.906 -> 0.932 recall@10 at 1M for ~no latency
            # cost with the exact rescore unchanged (diskann_1m_raw_diag)
            beam = beam * 5 // 4
        live = corpus.valid_mask(mask)[: self.built_rows]
        qj = jnp.asarray(np.atleast_2d(q.astype(np.float32)))
        starts = self._query_starts(coll, qj, live)
        guided = _PQ_METRIC_KIND.get(metric)
        # _force_pq / _force_sq8: test hooks to exercise the streaming
        # guidance tiers without a
        # >HBM corpus (the dispatch below is otherwise driven by residency)
        force_stream = getattr(self, "_force_pq", False) or getattr(self, "_force_sq8", False)
        use_bf16 = guided and not corpus.would_stream() and not force_stream
        if guided and corpus.would_stream() and not self.layered:
            # legacy index built resident on a corpus that now streams: fit
            # the PQ tier once from the host mirror; persist it unless the
            # collection is read-only (then it lives for this process only)
            self._fit_pq(np.asarray(
                corpus.host_rows(np.arange(self.built_rows)), dtype=np.float32))
            if not getattr(coll, "read_only", False):
                self.save(coll)
        q2 = np.atleast_2d(q.astype(np.float32))

        def _dispatch(qc, sc, q_np):
            """One beam dispatch over a (<=cap)-query chunk; returns
            (ids, dists, scanned) host arrays."""
            if use_bf16:
                # bf16-guided beam + exact host-mirror rescore: the centered
                # bf16 scan array is already HBM-resident for the flat path,
                # so guidance runs at bf16 precision (graph-quality-limited:
                # 1M measured 0.954 exact-beam vs 0.532 PQ-guided at
                # beam=150 — PQ guidance is reserved for streaming corpora)
                aux = corpus.bf16_aux()
                _, pool, scanned = beam_search_bf16(
                    qc, corpus.data16, aux["mean"], aux["xm"], aux["xc_sq"],
                    aux["xsq_true"], self._graph(), sc, live,
                    metric_kind=guided, beam=beam, max_steps=beam * 2,
                )
                ids, n_sc = fetch_pool_scanned(pool, scanned)
                return ids, corpus.rescore(q_np, ids, metric), n_sc + ids.shape[1]
            sq8_tier = (self._sq8_fits_device() and not getattr(self, "_force_pq", False)) \
                or getattr(self, "_force_sq8", False)
            if self.layered and guided and sq8_tier:
                # streaming middle tier: SQ8-guided beam (1 byte/dim) walks
                # at near-bf16 quality where PQ's subspace smearing
                # collapses recall (r4 streaming DISKANN-IP: 0.709 vs the
                # 0.90 floor under PQ guidance); exact rescore from the
                # host mirror recovers true ranking
                beam_q = beam * 5 // 4
                c_d, lo_d, sc_d, rsq_d = self._sq8_device()
                _, pool, scanned = beam_search_sq8(
                    qc, c_d, lo_d, sc_d, rsq_d, self._graph(), sc, live,
                    metric_kind=guided, beam=beam_q, max_steps=beam_q * 2,
                )
                ids, n_sc = fetch_pool_scanned(pool, scanned)
                return ids, corpus.rescore(q_np, ids, metric), n_sc + ids.shape[1]
            if self.layered and guided:
                # deepest tier: PQ-guided beam (M bytes/row), alpha
                # row-scale corrected + true-norm keys, exact rescore from
                # the host mirror (diskann.rs:602 + uses_store_rescore
                # semantics). The PQ proxy still smears ranking, so the
                # walk runs with a 2x pool
                beam_pq = 2 * beam
                codes_d, books_d, alpha_d, row_sq_d = self._pq_device()
                _, pool, scanned = beam_search_pq(
                    qc, codes_d, books_d, alpha_d, row_sq_d, self._graph(),
                    sc, live,
                    metric_kind=guided, beam=beam_pq, max_steps=beam_pq * 2,
                )
                ids, n_sc = fetch_pool_scanned(pool, scanned)
                return ids, corpus.rescore(q_np, ids, metric), n_sc + ids.shape[1]
            keys, ids, scanned = beam_search(
                qc, corpus._data, self._graph(), sc, live,
                metric=metric, beam=beam, max_steps=beam * 2, k=k,
            )
            keys, ids, n_sc = fetch_keys_pool_scanned(keys, ids, scanned)
            return ids, -keys if metric.ascending else keys, n_sc

        # the beam kernels carry a (b, n) visited bitmap on device — cap
        # the query sub-batch so it stays within budget (matters exactly
        # when n is streaming-scale; see _beam_batch_cap)
        cap = _beam_batch_cap(self.built_rows)
        nq = int(qj.shape[0])
        if nq <= cap:
            ids, dists, self.last_scanned = _dispatch(qj, starts, q2)
        else:
            parts = [_dispatch(qj[i : i + cap], starts[i : i + cap],
                               q2[i : i + cap])
                     for i in range(0, nq, cap)]
            ids = np.concatenate([p[0] for p in parts])
            dists = np.concatenate([p[1] for p in parts])
            self.last_scanned = max(p[2] for p in parts)

        # exact merge of any rows that remain UNLINKED (read-only legacy
        # loads where streaming linking could not run): entry-sample pinning
        # alone only guarantees the entry scan's top-ENTRY_TOP of them reach
        # the pool, which silently under-returns for k > ENTRY_TOP — scoring
        # the whole (small) set exactly makes them correct for any k
        unl = np.asarray(getattr(self, "_unlinked_ids", ()), dtype=np.int64)
        unl = unl[unl < self.built_rows]
        if len(unl):
            live_np = np.asarray(live)
            ud = corpus.rescore(np.atleast_2d(q.astype(np.float32)), unl, metric)
            uids = np.broadcast_to(unl, (dists.shape[0], len(unl))).copy()
            bad = ~live_np[unl]
            ud = np.where(bad[None, :] | ~np.isfinite(ud),
                          np.inf if metric.ascending else -np.inf, ud)
            uids[:, bad] = -1
            dists = np.concatenate([dists, ud.astype(np.float32)], axis=1)
            ids = np.concatenate([ids, uids], axis=1)

        # exact tail for rows added after build
        if self.built_rows < coll.n_rows:
            tail_mask = np.zeros(coll.n_rows, dtype=bool)
            tail_mask[self.built_rows :] = True
            if mask is not None:
                tail_mask &= mask[: coll.n_rows]
            td, ti = corpus.search(q, k, metric, filter_mask=tail_mask)
            if td.shape[1]:
                pad = np.full(
                    (dists.shape[0], td.shape[1]),
                    np.inf if metric.ascending else -np.inf,
                    np.float32,
                )
                pad_ids = np.full((dists.shape[0], td.shape[1]), -1, np.int64)
                pad[:, : td.shape[1]] = td
                pad_ids[:, : ti.shape[1]] = ti
                dists = np.concatenate([dists, pad], axis=1)
                ids = np.concatenate([ids, pad_ids], axis=1)

        return _finalize_ranked(dists, ids, k, metric)

    # ── lifecycle: in-place updates (reference IP-DiskANN) ───────────────

    def on_commit(self, coll) -> None:
        """Bring the graph up to date in place: repair edges into
        newly-tombstoned nodes (diskann.rs:1337 delete repair + Alg-6
        consolidation :502-560), link rows added since the last commit
        (:1496 in-place insert), and re-link any live node that lost all
        in-edges (covers restore-from-tombstone). A full rebuild runs only
        when accumulated churn passes REBUILD_CHURN_FRACTION."""
        n = coll.n_rows
        if n == 0 or self.built_rows == 0:
            return
        # churn = rows inserted since the last full build + rows currently
        # tombstoned; repair work itself is maintenance, not churn
        inserted = getattr(self, "_inserted_since_build", 0) + max(n - self.built_rows, 0)
        tomb_count = coll.tombstones.count()
        base = getattr(self, "_rows_at_build", self.built_rows)
        corpus = coll.corpus()
        if corpus.would_stream():
            # >HBM corpora: the in-place kernels (and a rebuild) need the
            # resident f32 rows, which don't exist — run the host-side
            # streaming maintenance instead
            self._inserted_since_build = inserted
            self._on_commit_streaming(coll, corpus, n)
            return
        # replacement churn: the fraction of the built corpus swapped out
        if max(inserted, tomb_count) > REBUILD_CHURN_FRACTION * max(base, 1):
            self.rebuild(coll)
            return
        self._inserted_since_build = inserted

        tombs = coll.tombstones.to_bool_array(n)
        rows_dev = corpus._data[:n].astype(jnp.float32)
        live = np.ones(n, dtype=bool)
        live[: len(tombs)] &= ~tombs
        changed = False

        # entry points must stay live (a dead medoid strands the beam)
        if not live[self._starts_np].all():
            live_rows = np.nonzero(live)[0]
            if len(live_rows) == 0:
                return
            rows = np.asarray(corpus.host_rows(live_rows), dtype=np.float32)
            self._starts_np = self._starts_from_sample(rows, live_rows)
            changed = True
        starts = jnp.asarray(self._starts_np.astype(np.int32))

        repaired = repair_deleted_edges(
            self.graph_np, tombs[: self.built_rows], rows_dev,
            metric=self.metric, r=self.r, alpha=self.alpha,
        )
        changed = changed or bool(repaired)

        if n > self.built_rows:
            new_ids = np.arange(self.built_rows, n, dtype=np.int64)
            new_ids = new_ids[live[self.built_rows : n]]
            self.graph_np = insert_points(
                self.graph_np, new_ids, rows_dev, starts, live,
                metric=self.metric, r=self.r, l_build=self.l, alpha=self.alpha,
            )
            if self.layered:
                # keep the PQ code tier in lockstep (codebooks stay fixed;
                # a rebuild refits them once churn crosses the threshold)
                tail = corpus.host_rows(np.arange(self.built_rows, n))
                self.pq_codes = np.concatenate(
                    [self.pq_codes, self.pq.encode(np.asarray(tail, dtype=np.float32))]
                )
                self._pq_dev = None
            self.built_rows = n
            changed = True

        # rows that arrived while the corpus streamed (edge-less, pinned in
        # the entry sample) get their real adjacency now that f32 rows are
        # resident again
        unl = np.asarray(getattr(self, "_unlinked_ids", ()), dtype=np.int64)
        unl = unl[unl < n]  # compaction can shrink the corpus under stale ids
        if len(unl):
            unl_live = unl[live[unl]]
            if len(unl_live):
                self.graph_np = insert_points(
                    self.graph_np, unl_live, rows_dev, starts, live,
                    metric=self.metric, r=self.r, l_build=self.l,
                    alpha=self.alpha,
                )
            self._unlinked_ids = np.empty(0, dtype=np.int64)
            changed = True

        relinked = reconnect_orphans(
            self.graph_np, live[: self.built_rows], rows_dev, starts,
            metric=self.metric, r=self.r, l_build=self.l, alpha=self.alpha,
        )
        changed = changed or bool(relinked)

        if changed:
            self._graph_dev = None
            self._entry_dev = None  # sample must track the grown/culled corpus
            self.save(coll)

    def _on_commit_streaming(self, coll, corpus, n: int) -> None:
        """Maintenance for corpora past the HBM budget. The resident-path
        kernels (insert_points / repair / rebuild) all stage the full f32
        corpus, which by definition does not fit — so new rows are linked
        IN PLACE the way the reference's IP-DiskANN inserts into its
        on-disk graph (diskann.rs:1496): the PQ-guided device beam finds
        each new row's candidate pool, only those candidate f32 rows are
        gathered from the host mirror, and the exact alpha-prune +
        reverse-edge merge run over the gathers. Tombstone prune-repair is
        deferred (the beam masks dead nodes via the live mask); rows that
        somehow remain unlinked (read-only legacy loads) stay pinned in
        the entry sample and exact-merged at search time."""
        changed = False
        tombs = coll.tombstones.to_bool_array(n)
        live = np.ones(n, dtype=bool)
        live[: len(tombs)] &= ~tombs
        to_link = np.asarray(getattr(self, "_unlinked_ids", ()),
                             dtype=np.int64)
        to_link = to_link[to_link < n]
        if n > self.built_rows:
            new_ids = np.arange(self.built_rows, n, dtype=np.int64)
            self.graph_np = np.concatenate([
                self.graph_np,
                np.full((len(new_ids), self.r), -1, dtype=self.graph_np.dtype),
            ])
            if not self.layered:
                # legacy resident-built index whose corpus now streams: the
                # beam needs the PQ tier to walk — fit it once (search does
                # the same lazily, but linking needs it NOW)
                self._fit_pq(np.asarray(
                    corpus.host_rows(np.arange(self.built_rows)),
                    dtype=np.float32))
            tail = np.asarray(corpus.host_rows(new_ids), dtype=np.float32)
            tail_codes = self.pq.encode(tail)
            self.pq_codes = np.concatenate([self.pq_codes, tail_codes])
            if self.pq_alpha is not None:
                dec = self.pq.decode(tail_codes)
                num = np.einsum("nd,nd->n", tail, dec)
                den = np.einsum("nd,nd->n", dec, dec)
                self.pq_alpha = np.concatenate([
                    self.pq_alpha,
                    np.where(den > 0, num / np.maximum(den, 1e-30), 1.0).astype(np.float32),
                ])
                self.pq_row_sq = np.concatenate([
                    self.pq_row_sq,
                    np.einsum("nd,nd->n", tail, tail).astype(np.float32),
                ])
            if self.sq8_codes is not None:
                sq = SQ8(self.sq8_lo, self.sq8_lo + self.sq8_scale * 255.0)
                self.sq8_codes = np.concatenate([self.sq8_codes, sq.encode(tail)])
                self._sq8_dev = None
            self._pq_dev = None
            self.built_rows = n
            to_link = np.concatenate([to_link, new_ids])
            changed = True
        if len(to_link) and self.layered:
            # currently-tombstoned rows are linked too: edges into dead
            # nodes are masked by the live mask at search time, and a later
            # restore_items must find the row reachable (the streaming path
            # has no reconnect_orphans pass). Rows the link pass could not
            # wire to a pre-existing node stay in the backlog: pinned into
            # the entry sample + exact-merged at search, retried next commit
            self._unlinked_ids = self._link_streaming(
                coll, corpus, to_link, live)
            changed = True
        else:
            # linking unavailable: keep the rows pinned in the entry sample
            # (search exact-merges them for any k)
            self._unlinked_ids = to_link
        # entry points must stay live even while streaming (host-side fix)
        if not live[self._starts_np].all():
            live_rows = np.nonzero(live)[0]
            if len(live_rows):
                # bounded sample: the full corpus is past the HBM budget, so
                # materializing every f32 row on the host just to pick entry
                # points is the exact blow-up this path exists to avoid; a
                # medoid/top-norm pick over 256k live rows is as good an
                # entry seed in practice
                if len(live_rows) > 262_144:
                    sel = np.random.default_rng(0).choice(
                        live_rows, size=262_144, replace=False)
                    sel.sort()
                else:
                    sel = live_rows
                rows = np.asarray(corpus.host_rows(sel), dtype=np.float32)
                self._starts_np = self._starts_from_sample(rows, sel)
                changed = True
        if changed:
            self._graph_dev = None
            self._entry_dev = None
            self.save(coll)

    def _link_streaming(self, coll, corpus, new_ids: np.ndarray,
                        live: np.ndarray) -> np.ndarray:
        """In-place graph insert while the full f32 corpus exceeds the HBM
        budget (reference: IP-DiskANN inserts against the on-disk graph,
        diskann.rs:1496). Candidate discovery walks the device PQ tier;
        exactification gathers ONLY the candidate f32 rows from the host
        mirror — nothing corpus-sized is staged. For IP the prune runs in
        construction space (angular: L2 over normalized rows, see
        ops/graph._construction_space), so candidate discovery walks the
        PQ codes under "cos".

        Returns the ids that did NOT receive an in-edge from a
        pre-existing node: the beam can never reach a zero-in-degree row
        (and an in-edge granted only by a sibling new row can form an
        unreachable island), so such rows stay in `_unlinked_ids` — the
        entry sample pins them and search exact-merges them (correct for
        any k) until a later commit or rebuild wires them for real."""
        ip = self.metric is Metric.IP
        metric_c = Metric.L2 if ip else self.metric
        desc = not metric_c.ascending
        walk_kind = "cos" if ip else _PQ_METRIC_KIND[self.metric]
        r, lw = self.r, max(self.l, 2 * self.r)
        self._graph_dev = None  # the adjacency just grew
        self._entry_dev = None
        graph_dev = self._graph()
        use_sq8 = self._sq8_fits_device()
        if use_sq8:
            sq8_codes_d, sq8_lo_d, sq8_scale_d, sq8_rsq_d = self._sq8_device()
        else:
            codes_d, books_d, alpha_d, row_sq_d = self._pq_device()
        live_dev = jnp.asarray(live[: self.built_rows])
        # the beam's (b, n) visited bitmap bounds the sub-batch (see
        # _beam_batch_cap); pad to the smallest allowed bucket so repeated
        # streaming commits reuse at most a couple of compiled shapes
        cap = _beam_batch_cap(self.built_rows)
        buckets = tuple(s for s in (16, 64, 256, 1024) if s <= cap) or (16,)

        def raw_rows(ids: np.ndarray) -> np.ndarray:
            return np.asarray(
                corpus.host_rows(np.maximum(ids, 0).astype(np.int64).ravel()),
                dtype=np.float32).reshape(*ids.shape, -1)

        def cspace(rows: np.ndarray) -> np.ndarray:
            if ip:
                rows = rows / np.maximum(
                    np.linalg.norm(rows, axis=-1, keepdims=True), 1e-30)
            return rows

        def bucket(m: int) -> int:
            return next((s for s in buckets if m <= s), buckets[-1])

        rev_src: list[np.ndarray] = []
        rev_dst: list[np.ndarray] = []
        step = buckets[-1]
        for lo in range(0, len(new_ids), step):
            chunk = new_ids[lo : lo + step]
            m = len(chunk)
            mp = bucket(m)
            cpad = np.concatenate([chunk, np.full(mp - m, chunk[0], np.int64)])
            raw = raw_rows(cpad)  # one host gather serves walk + prune
            qj = jnp.asarray(raw)
            starts = self._query_starts(coll, qj, live_dev)
            if use_sq8:
                _, pool, _ = beam_search_sq8(
                    qj, sq8_codes_d, sq8_lo_d, sq8_scale_d, sq8_rsq_d,
                    graph_dev, starts, live_dev,
                    metric_kind=walk_kind, beam=lw, max_steps=2 * lw)
            else:
                _, pool, _ = beam_search_pq(
                    qj, codes_d, books_d, alpha_d, row_sq_d, graph_dev,
                    starts, live_dev,
                    metric_kind=walk_kind, beam=lw, max_steps=2 * lw)
            cand = np.asarray(pool, dtype=np.int64)  # (mp, lw)
            pruned = np.asarray(prune_gathered(
                jnp.asarray(cspace(raw)), jnp.asarray(cspace(raw_rows(cand))),
                jnp.asarray(cpad.astype(np.int64)), jnp.asarray(cand),
                self.alpha, metric=metric_c, r=r, descending=desc))[:m]
            self.graph_np[chunk] = pruned.astype(self.graph_np.dtype)
            fwd = pruned.ravel()
            keep = fwd >= 0
            rev_src.append(np.repeat(chunk, r)[keep])
            rev_dst.append(fwd[keep])

        # reverse-edge merge: each forward target re-prunes its list against
        # its requesters (capped first-come at r per target, matching the
        # build's deterministic reverse pass). Vectorized requester slotting:
        # rank-within-group < r picks each target's first r requesters.
        src = np.concatenate(rev_src) if rev_src else np.empty(0, np.int64)
        uniq = np.empty(0, dtype=np.int64)
        if len(src):
            dst = np.concatenate(rev_dst)
            order = np.argsort(dst, kind="stable")
            src, dst = src[order], dst[order]
            uniq, starts_i, counts = np.unique(
                dst, return_index=True, return_counts=True)
            rank = np.arange(len(dst)) - np.repeat(starts_i, counts)
            grp = np.repeat(np.arange(len(uniq)), counts)
            keep = rank < r
            req = np.full((len(uniq), r), -1, dtype=np.int64)
            req[grp[keep], rank[keep]] = src[keep]
            existing = self.graph_np[uniq].astype(np.int64)  # (T, r)
            dup = (req[:, :, None] == existing[:, None, :]).any(-1)
            req[dup] = -1
            for lo in range(0, len(uniq), step):
                vs = uniq[lo : lo + step]
                m = len(vs)
                mp = bucket(m)
                vpad = np.concatenate([vs, np.full(mp - m, vs[0], np.int64)])
                cands = np.full((mp, 2 * r), -1, dtype=np.int64)
                cands[:m, :r] = existing[lo : lo + m]
                cands[:m, r:] = req[lo : lo + m]
                pruned = np.asarray(prune_gathered(
                    jnp.asarray(cspace(raw_rows(vpad))),
                    jnp.asarray(cspace(raw_rows(cands))),
                    jnp.asarray(vpad.astype(np.int64)), jnp.asarray(cands),
                    self.alpha, metric=metric_c, r=r, descending=desc))[:m]
                self.graph_np[vs] = pruned.astype(self.graph_np.dtype)

        # in-edges granted this commit can only live in rows written this
        # commit; count only those from PRE-EXISTING nodes (an in-edge from
        # a sibling new row can be an unreachable island). Orphans stay
        # pinned/exact-merged rather than force-evicting someone else's edge.
        old_writers = uniq[~np.isin(uniq, new_ids)]
        reached = np.isin(new_ids, self.graph_np[old_writers]) if len(
            old_writers) else np.zeros(len(new_ids), dtype=bool)
        return new_ids[~reached]

    def rebuild(self, coll) -> None:
        from . import IndexBuildOptions

        opts = IndexBuildOptions(r=self.r, l=self.l, alpha=self.alpha)
        fresh = DiskANNIndex.build(coll, self.mode, opts)
        self.__dict__.update(fresh.__dict__)
        self._inserted_since_build = 0
        self._rows_at_build = self.built_rows


def _finalize_ranked(dists: np.ndarray, ids: np.ndarray, k: int, metric: Metric):
    """Order candidates, drop invalid/dup entries, truncate to k."""
    b = dists.shape[0]
    keyed = -dists if metric.ascending else dists
    out_d, out_i = [], []
    for row in range(b):
        order = np.argsort(-keyed[row], kind="stable")
        seen = set()
        dd, ii = [], []
        for j in order:
            rid = int(ids[row, j])
            if rid < 0 or not np.isfinite(keyed[row, j]) or rid in seen:
                continue
            seen.add(rid)
            dd.append(dists[row, j])
            ii.append(rid)
            if len(ii) >= k:
                break
        out_d.append(dd)
        out_i.append(ii)
    width = max((len(x) for x in out_i), default=0)
    d_arr = np.zeros((b, width), dtype=np.float32)
    i_arr = np.full((b, width), -1, dtype=np.int64)
    for row in range(b):
        d_arr[row, : len(out_d[row])] = out_d[row]
        i_arr[row, : len(out_i[row])] = out_i[row]
    return d_arr, i_arr
