"""Aux quantized shortlist indexes for FLAT modes: SQ8 / PQ / RaBitQ / PolarVec.

Two-pass search mirroring the reference (engine.rs:5504 aux quantized path,
pq_mmap.rs/rabitq_mmap.rs/polarvec_mmap.rs): an approximate int8-matmul scan
over the whole corpus produces an oversampled shortlist; candidates are
exactly re-ranked from the f32 corpus on device.
"""

from __future__ import annotations

import json
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import Metric
from ..ops import quantize as Q
from ..ops.scan import _batch_bucket, shortlist_device_rescore_ids
from ..ops.topk import masked_top_c
from ..storage.vector_store import write_atomic

OVERSAMPLE = {"sq8": 4, "pq": 8, "rabitq": 16, "polarvec": 8}

_METRIC_KIND = {Metric.IP: "ip", Metric.L2: "l2", Metric.COSINE: "cosine"}


@partial(jax.jit, static_argnames=("kind", "metric", "s", "c", "dim_pad"))
def _fused_search_ids(q, state, x16, aux, valid, *, kind, metric, s, c, dim_pad):
    """One-dispatch quantized search: approximate int8/ADC code scan, top-S
    shortlist, near-exact bf16 device rescore, top-C — the caller fetches a
    single (B, C) int32 id block and finishes with the exact f32 host
    rescore. Folding the query rotation (RaBitQ/PolarVec) in here also kills
    the eager per-op dispatches the old path paid."""
    mk = _METRIC_KIND[metric]
    if kind == "sq8":
        scores = Q.sq8_scores(
            q, state["codes"], state["lo"], state["scale"], state["row_sq"], mk)
    elif kind == "rabitq":
        q_rot = Q.rotate(q, state["signs"], dim_pad)
        q_sq = jnp.sum(q * q, axis=-1)
        scores = Q.rabitq_scores(
            q_rot, state["bits"], state["alpha"], state["row_sq"], q_sq, mk)
    elif kind == "polarvec":
        q_rot = Q.rotate(q, state["signs"], dim_pad)
        q_sq = jnp.sum(q * q, axis=-1)
        scores = Q.polarvec_scores(
            q_rot, state["codes"], state["lo"], state["scale"],
            state["row_sq"], q_sq, mk)
    elif kind == "pq":
        scores = Q.pq_scores(
            q, state["codes"], state["codebooks"],
            state["row_sq"], mk)
    else:
        raise ValueError(kind)
    return shortlist_device_rescore_ids(
        q, scores, x16, aux, valid, metric=metric, s=s, c=c)


class AuxQuantIndex:
    def __init__(self, coll, mode, opts, kind: str, state: dict, encoded_rows: int):
        self.mode = mode
        self.metric: Metric = mode.metric
        self.kind = kind
        self.state = state  # numpy arrays (host copies)
        self.encoded_rows = encoded_rows
        self._dev: Optional[dict] = None

    # ── build / encode ───────────────────────────────────────────────────

    @classmethod
    def build(cls, coll, mode, opts) -> "AuxQuantIndex":
        import time

        phases = {}
        t0 = time.perf_counter()
        data = coll.store.read_all()
        phases["read_s"] = round(time.perf_counter() - t0, 2)
        if data.shape[0] == 0:
            raise ValueError("cannot build a quantized index on an empty collection")
        kind = mode.quantizer
        t0 = time.perf_counter()
        state = cls._fit_encode(kind, data, mode)
        phases["encode_s"] = round(time.perf_counter() - t0, 2)
        idx = cls(coll, mode, opts, kind, state, data.shape[0])
        t0 = time.perf_counter()
        idx.save(coll)
        phases["save_s"] = round(time.perf_counter() - t0, 2)
        idx.last_build_phases = phases  # build-cost attribution for gates
        return idx

    @staticmethod
    def _fit_encode(kind: str, data: np.ndarray, mode) -> dict:
        if kind == "sq8":
            sq = Q.SQ8.fit(data)
            codes = sq.encode(data)
            return {"codes": codes, "lo": sq.lo, "scale": sq.scale,
                    "row_sq": sq.row_sq_from_codes(codes)}
        if kind == "rabitq":
            rq = Q.RaBitQ.fit(data.shape[1])
            enc = rq.encode(data)
            return {"signs": rq.signs, "dim_pad": np.int64(rq.dim_pad), **enc}
        if kind == "polarvec":
            bits = mode.polarvec_bits or 4
            pv = Q.PolarVec.fit(data.shape[1], bits=bits)
            enc = pv.encode(data)
            return {"signs": pv.signs, "dim_pad": np.int64(pv.dim_pad),
                    "bits": np.int64(bits), **enc}
        if kind == "pq":
            pq = Q.PQ.fit(data, mode.pq_subspaces)
            codes = pq.encode(data)
            return {"codes": codes, "codebooks": pq.codebooks,
                    "row_sq": pq.row_sq_from_codes(codes)}
        raise ValueError(f"unknown quantizer kind: {kind}")

    def _encode_tail(self, data: np.ndarray) -> dict:
        """Encode new rows with the existing trained parameters."""
        s = self.state
        if self.kind == "sq8":
            sq = Q.SQ8(s["lo"], s["lo"] + s["scale"] * 255.0)
            codes = sq.encode(data)
            return {"codes": codes, "row_sq": sq.row_sq_from_codes(codes)}
        if self.kind == "rabitq":
            rq = Q.RaBitQ(s["signs"], data.shape[1], int(s["dim_pad"]))
            return rq.encode(data)
        if self.kind == "polarvec":
            pv = Q.PolarVec(s["signs"], data.shape[1], int(s["dim_pad"]), int(s["bits"]))
            return pv.encode(data)
        if self.kind == "pq":
            pq = Q.PQ(s["codebooks"])
            codes = pq.encode(data)
            return {"codes": codes, "row_sq": pq.row_sq_from_codes(codes)}
        raise ValueError(self.kind)

    # ── persistence ──────────────────────────────────────────────────────

    def save(self, coll) -> None:
        idx_dir = coll.root / "index"
        idx_dir.mkdir(parents=True, exist_ok=True)
        np.savez(idx_dir / "aux.npz", **{k: np.asarray(v) for k, v in self.state.items()})
        write_atomic(
            idx_dir / "aux_meta.json",
            json.dumps({"kind": self.kind, "encoded_rows": int(self.encoded_rows)}).encode(),
        )

    @classmethod
    def load(cls, coll, mode, opts) -> Optional["AuxQuantIndex"]:
        idx_dir = coll.root / "index"
        path = idx_dir / "aux.npz"
        if not path.exists():
            return None
        data = np.load(path)
        meta = json.loads((idx_dir / "aux_meta.json").read_text())
        state = {k: data[k] for k in data.files}
        return cls(coll, mode, opts, meta["kind"], state, meta["encoded_rows"])

    # ── search ───────────────────────────────────────────────────────────

    def _device(self, corpus=None) -> dict:
        if self._dev is None:
            mesh = getattr(corpus, "mesh", None)
            if mesh is None:
                self._dev = {
                    k: jnp.asarray(v)
                    for k, v in self.state.items()
                    if isinstance(v, np.ndarray) and v.ndim >= 1
                }
            else:
                # mesh mode: per-row arrays (codes/bits/row_sq/...) shard
                # over the corpus axis like the scan copy; per-dim params
                # (lo/scale/signs/codebooks) replicate — matching the
                # fused search's sharded (B, N) score layout
                from ..ops.scan import _put

                rows = self.encoded_rows
                self._dev = {
                    k: _put(v, corpus._rows_sharding(v.ndim)
                            if v.shape[0] == rows else corpus._repl_sharding())
                    for k, v in self.state.items()
                    if isinstance(v, np.ndarray) and v.ndim >= 1
                }
        return self._dev

    def _approx_scores(self, q: np.ndarray) -> jnp.ndarray:
        dev = self._device()
        kind = _METRIC_KIND[self.metric]
        qj = jnp.asarray(q)
        if self.kind == "sq8":
            return Q.sq8_scores(qj, dev["codes"], dev["lo"], dev["scale"], dev["row_sq"], kind)
        if self.kind == "rabitq":
            q_rot = Q.rotate(qj, self.state["signs"], int(self.state["dim_pad"]))
            q_sq = jnp.sum(qj * qj, axis=-1)
            return Q.rabitq_scores(q_rot, dev["bits"], dev["alpha"], dev["row_sq"], q_sq, kind)
        if self.kind == "polarvec":
            q_rot = Q.rotate(qj, self.state["signs"], int(self.state["dim_pad"]))
            q_sq = jnp.sum(qj * qj, axis=-1)
            return Q.polarvec_scores(
                q_rot, dev["codes"], dev["lo"], dev["scale"], dev["row_sq"], q_sq, kind
            )
        if self.kind == "pq":
            return Q.pq_scores(qj, dev["codes"], dev["codebooks"], dev["row_sq"], kind)
        raise ValueError(self.kind)

    def _shortlist_width(self, k: int, n_codes: int) -> int:
        # scale-aware shortlist: a fixed k-multiple collapses at large N
        # (80 of 1M rows missed the recall floors); the floor terms keep
        # ~0.4% of the corpus in play, capped so the exact rescore stays cheap
        return min(
            max(k * OVERSAMPLE[self.kind], 1024, n_codes // 250),
            n_codes, 16384,
        )

    def search(self, coll, q: np.ndarray, k: int, nprobe: int = 0, mask: Optional[np.ndarray] = None):
        q = np.atleast_2d(np.asarray(q, dtype=np.float32))
        n_codes = self.encoded_rows
        corpus = coll.corpus()
        if q.shape[0] > 64 and n_codes >= 262_144:
            # bound the fused chain's HBM: (B, N) approx scores + the
            # (B, S, D) rescore gather — 64-query slices keep both < 300 MB
            parts = [self.search(coll, q[s : s + 64], k, nprobe, mask)
                     for s in range(0, q.shape[0], 64)]
            width = max(p[0].shape[1] for p in parts)

            def padto(a, fill):
                if a.shape[1] == width:
                    return a
                pad = np.full((a.shape[0], width - a.shape[1]), fill, a.dtype)
                return np.concatenate([a, pad], axis=1)

            return (np.concatenate([padto(p[0], 0.0) for p in parts]),
                    np.concatenate([padto(p[1], -1) for p in parts]))
        if not corpus.streaming and n_codes >= coll.n_rows and n_codes > 0:
            b = q.shape[0]
            bucket = _batch_bucket(b)  # share executables across [1, 256]
            qp = (np.concatenate([q, np.zeros((bucket - b, q.shape[1]), q.dtype)])
                  if bucket != b else q)
            s = self._shortlist_width(k, n_codes)
            c = min(s, max(64, 4 * k))
            self.last_scanned = n_codes + s
            out = _fused_search_ids(
                corpus.stream_stage_queries(qp), self._device(corpus), corpus.data16,
                corpus.bf16_aux(), corpus.valid_mask(mask),
                kind=self.kind, metric=self.metric, s=s, c=c,
                dim_pad=int(self.state["dim_pad"]) if "dim_pad" in self.state else 0,
            )
            ids = np.asarray(out)[:b].astype(np.int64)  # the single host sync
            return corpus._rescore_topk(q, ids, ids >= 0, self.metric, k)
        return self._search_host(coll, q, k, mask)

    def _search_host(self, coll, q: np.ndarray, k: int, mask: Optional[np.ndarray] = None):
        """Two-fetch fallback: streaming corpora (no resident bf16 copy to
        rescore from) and collections with an unencoded post-commit tail."""
        metric = self.metric
        corpus = coll.corpus()
        n_codes = self.encoded_rows

        scores = self._approx_scores(q)  # (B, n_codes)
        live = corpus.valid_mask(mask)[:n_codes]
        shortlist = self._shortlist_width(k, n_codes)
        # code scan touches every encoded row; shortlist rows get exact
        # rescored. Shortlist selection rides approx_max_k like the flat
        # two-pass (the exact re-rank + oversampling absorb its misses).
        self.last_scanned = n_codes + shortlist
        _, cand = masked_top_c(scores, shortlist, metric.ascending, live)
        cand_np = np.asarray(cand).astype(np.int64)

        # exact re-rank of shortlisted candidates from the f32 corpus
        exact = corpus.rescore(q, cand_np, metric)  # (B, shortlist)

        # exact-scanned tail for rows encoded after the last on_commit
        if n_codes < coll.n_rows:
            tail_mask = np.zeros(coll.n_rows, dtype=bool)
            tail_mask[n_codes:] = True
            if mask is not None:
                # mask may arrive as a cached FilterHandle (engine) or a
                # raw bool array (direct callers)
                host_mask = getattr(mask, "mask", mask)
                tail_mask &= host_mask[: coll.n_rows]
            extra_d, extra_i = corpus.search(q, k, metric, filter_mask=tail_mask)
            if extra_i.shape[1]:
                exact = np.concatenate(
                    [exact, np.where(extra_i >= 0, extra_d, np.nan)], axis=1)
                cand_np = np.concatenate([cand_np, extra_i], axis=1)

        # vectorized merge: stable best-first order with id tiebreak, then
        # dedup (a tail row can also appear in the shortlist) and trim to k
        keyed = np.where(np.isnan(exact), -np.inf, -exact if metric.ascending else exact)
        keyed = np.where(cand_np >= 0, keyed, -np.inf)
        safe = np.where(cand_np >= 0, cand_np, np.iinfo(np.int64).max)
        order = np.lexsort((safe, -keyed), axis=1)
        d_s = np.take_along_axis(exact, order, axis=1)
        i_s = np.take_along_axis(cand_np, order, axis=1)
        k_s = np.take_along_axis(keyed, order, axis=1)
        # drop duplicate ids (sorted by key then id, so equal ids with equal
        # exact scores are adjacent only when keys tie; guard generally by
        # masking any id seen earlier in the row)
        b_n, w = i_s.shape
        dup = np.zeros_like(k_s, dtype=bool)
        srt = np.sort(np.where(k_s > -np.inf, i_s, -1), axis=1)
        # mark rows that contain duplicates; only those pay the python path
        has_dup = (np.diff(srt, axis=1) == 0).any(axis=1)
        for b in np.nonzero(has_dup)[0]:
            seen: set = set()
            for j in range(w):
                rid = int(i_s[b, j])
                if k_s[b, j] == -np.inf:
                    break
                if rid in seen:
                    dup[b, j] = True
                else:
                    seen.add(rid)
        k_s = np.where(dup, -np.inf, k_s)
        keep = k_s > -np.inf
        if dup.any():  # recompact after dedup
            order2 = np.argsort(~keep, axis=1, kind="stable")
            d_s = np.take_along_axis(d_s, order2, axis=1)
            i_s = np.take_along_axis(i_s, order2, axis=1)
            keep = np.take_along_axis(keep, order2, axis=1)
        width = min(k, int(keep.sum(axis=1).max(initial=0)))
        d_arr = np.where(keep, d_s, 0.0)[:, :width].astype(np.float32)
        i_arr = np.where(keep, i_s, -1)[:, :width]
        return d_arr, i_arr

    # ── lifecycle ────────────────────────────────────────────────────────

    def on_commit(self, coll) -> None:
        n = coll.store.row_count
        if n > self.encoded_rows:
            tail = coll.store.read_rows(self.encoded_rows, n - self.encoded_rows)
            enc = self._encode_tail(tail)
            for key, val in enc.items():
                if key in self.state and isinstance(self.state[key], np.ndarray) and self.state[key].ndim >= 1:
                    if self.state[key].shape[0] == self.encoded_rows:
                        self.state[key] = np.concatenate([self.state[key], val], axis=0)
            self.encoded_rows = n
            self._dev = None
            self.save(coll)

    def rebuild(self, coll) -> None:
        data = coll.store.read_all()
        self.state = self._fit_encode(self.kind, data, self.mode)
        self.encoded_rows = data.shape[0]
        self._dev = None
        self.save(coll)


def build_aux_index(coll, mode, opts) -> AuxQuantIndex:
    return AuxQuantIndex.build(coll, mode, opts)


def load_aux_index(coll, mode, opts) -> Optional[AuxQuantIndex]:
    return AuxQuantIndex.load(coll, mode, opts)
