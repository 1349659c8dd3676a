"""HNSW-style hierarchical graph index, TPU-native.

Reference behavior contract: src/index/hnsw.rs — multi-layer small-world
graph, ef_search beam (nprobe maps to ef), m/ef_construction build params,
filtered search with brute-force fallback. The TPU formulation keeps the
behavior (greedy descent through sparse upper layers, beam at layer 0,
ef controls recall/latency) but builds layers batched: upper layers are
geometric subsamples wired by exact kNN matmuls (they are tiny), and layer 0
is a batched Vamana-style graph — pointer-chasing construction is replaced by
matmul-batched construction, which is the idiomatic TPU design.
"""

from __future__ import annotations

import json
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..metrics import Metric
from ..ops.graph import (
    beam_search,
    beam_search_bf16,
    build_vamana,
    entry_sample_ids,
    exact_knn_graph,
    fetch_keys_pool_scanned,
    fetch_pool_scanned,
    insert_points,
)
from ..storage.vector_store import write_atomic
from .diskann import _PQ_METRIC_KIND, _finalize_ranked

DEFAULT_M = 16
DEFAULT_EF_CONSTRUCTION = 128
DEFAULT_EF_SEARCH = 50
LAYER_DECAY = 16  # upper layer subsample ratio
# Layer-0 gets true incremental inserts (reference: hnsw.rs:784
# insert_point); a full rebuild (which also refreshes the upper subsample
# layers) is only the backstop past this growth fraction.
REBUILD_GROWTH_FRACTION = 0.5


class HNSWIndex:
    kind = "hnsw"

    def __init__(self, coll, mode, opts, layer0: np.ndarray, upper: list[dict],
                 entry: int, built_rows: int, m: int, efc: int, efs: int):
        self.mode = mode
        self.metric: Metric = mode.metric
        self.layer0_np = layer0
        self.upper = upper  # [{"nodes": (Ni,), "graph": (Ni, m)}] coarse->fine
        self.entry = int(entry)
        self.built_rows = int(built_rows)
        self.m = m
        self.ef_construction = efc
        self.ef_search = efs
        self.ip_starts = np.zeros(0, dtype=np.int32)
        self._dev = None

    @classmethod
    def build(cls, coll, mode, opts) -> "HNSWIndex":
        data = coll.store.read_all()
        n = data.shape[0]
        if n == 0:
            raise ValueError("cannot build an HNSW index on an empty collection")
        m = opts.m or DEFAULT_M
        efc = opts.ef_construction or DEFAULT_EF_CONSTRUCTION
        efs = opts.ef_search or DEFAULT_EF_SEARCH
        rows = jnp.asarray(data)

        # layer-0 degree is 2*m (the reference's m0, hnsw.rs m0 = 2*m) —
        # measured recall@10 1.0 vs 0.74 at r=m on clustered IP data
        layer0 = build_vamana(rows, mode.metric, r=2 * m, l_build=max(efc // 2, m * 2), alpha=1.2)

        # upper layers: geometric subsamples with exact kNN wiring
        rng = np.random.default_rng(7)
        upper: list[dict] = []
        max_level = opts.max_level or max(int(math.log(max(n, 2), LAYER_DECAY)), 0)
        nodes = np.arange(n)
        for _ in range(max_level):
            if len(nodes) <= max(m * 2, 8):
                break
            nodes = np.sort(rng.choice(nodes, size=max(len(nodes) // LAYER_DECAY, 4), replace=False))
            graph = exact_knn_graph(rows[jnp.asarray(nodes)], mode.metric, m)
            upper.insert(0, {"nodes": nodes.astype(np.int32), "graph": graph})
        entry = int(upper[0]["nodes"][0]) if upper else 0
        idx = cls(coll, mode, opts, layer0, upper, entry, n, m, efc, efs)
        idx.ip_starts = idx._compute_ip_starts(np.asarray(data))
        idx.save(coll)
        return idx

    def _compute_ip_starts(self, data: np.ndarray) -> np.ndarray:
        """Extra fixed entry points for inner-product search: the highest-norm
        rows. MIPS winners concentrate at large norms, but the greedy upper-
        layer descent lands on a single angular-nearest entry — the same
        reason the reference ships a dedicated IP-DiskANN entry strategy
        (diskann.rs IP handling) applies to the HNSW family."""
        if self.metric is not Metric.IP or len(data) == 0:
            return np.zeros(0, dtype=np.int32)
        norms = np.linalg.norm(np.asarray(data, dtype=np.float32), axis=1)
        return np.unique(np.argsort(-norms)[:4].astype(np.int32))

    # ── persistence ──────────────────────────────────────────────────────

    def save(self, coll) -> None:
        idx_dir = coll.root / "index"
        idx_dir.mkdir(parents=True, exist_ok=True)
        arrays = {"layer0": self.layer0_np, "ip_starts": self.ip_starts}
        for i, layer in enumerate(self.upper):
            arrays[f"u{i}_nodes"] = layer["nodes"]
            arrays[f"u{i}_graph"] = layer["graph"]
        np.savez(idx_dir / "hnsw.npz", **arrays)
        write_atomic(
            idx_dir / "hnsw_meta.json",
            json.dumps(
                {
                    "entry": self.entry,
                    "built_rows": self.built_rows,
                    "m": self.m,
                    "ef_construction": self.ef_construction,
                    "ef_search": self.ef_search,
                    "n_upper": len(self.upper),
                }
            ).encode(),
        )

    @classmethod
    def load(cls, coll, mode, opts) -> Optional["HNSWIndex"]:
        idx_dir = coll.root / "index"
        if not (idx_dir / "hnsw.npz").exists():
            return None
        meta = json.loads((idx_dir / "hnsw_meta.json").read_text())
        data = np.load(idx_dir / "hnsw.npz")
        upper = [
            {"nodes": data[f"u{i}_nodes"], "graph": data[f"u{i}_graph"]}
            for i in range(meta["n_upper"])
        ]
        idx = cls(coll, mode, opts, data["layer0"], upper, meta["entry"],
                  meta["built_rows"], meta["m"], meta["ef_construction"], meta["ef_search"])
        if "ip_starts" in data.files:
            idx.ip_starts = data["ip_starts"]
        return idx

    # ── search ───────────────────────────────────────────────────────────

    def _device(self, corpus):
        if self._dev is None:
            # upper-layer rows gathered from the HOST mirror: staging them
            # from device f32 would force the 2x-HBM f32 corpus copy just to
            # read a few thousand subsample rows
            # only the FINEST upper layer is staged: upper layers are
            # nested (a level-l node appears on every layer below it), so
            # entry selection scans just that layer (see _descend)
            self._dev = {"layer0": jnp.asarray(self.layer0_np)}
            if self.upper:
                nodes = self.upper[-1]["nodes"]
                self._dev["upper_ids"] = jnp.asarray(nodes.astype(np.int32))
                self._dev["upper_rows"] = jnp.asarray(
                    np.asarray(corpus.host_rows(nodes), dtype=np.float32))
        return self._dev

    ENTRY_SAMPLE = 16384  # same sweep evidence as DiskANN (diskann.py)
    ENTRY_TOP = 16  # >= k seeds: skewed-MIPS GT rows are mutually unreachable via the walk
    ENTRY_NORM_TOP = 4096  # top-norm band pinned into the IP sample (diskann.py)

    def _ip_entry_state(self, corpus):
        """Fixed node sample for the IP per-query entry scan (same design as
        DiskANN's — the greedy descent yields one angular-nearest entry, but
        MIPS winners concentrate at high norms, so the beam also needs
        entries picked under the true IP score). The random sample is
        unioned with the top-norm band (see diskann.py ENTRY_NORM_TOP)."""
        if getattr(self, "_ip_entry_dev", None) is None:
            n = self.built_rows
            ids = entry_sample_ids(n, self.ENTRY_SAMPLE,
                                   sq_norms=corpus.host_sq_norms(),
                                   norm_top=self.ENTRY_NORM_TOP)
            rows = corpus.host_rows(ids.astype(np.int64)).astype(np.float32)
            self._ip_entry_dev = (jnp.asarray(ids), jnp.asarray(rows))
        return self._ip_entry_dev

    def _descend(self, q_dev: jnp.ndarray, corpus, live) -> jnp.ndarray:
        """Entry selection: ONE exact scan over the finest upper layer's
        nodes. Upper layers are nested (a level-l node appears on every
        layer below it), so the finest layer's top picks dominate the
        classic per-layer greedy descent — and the per-layer HOST FETCH
        the old descent paid (np.asarray per layer = one ~33 ms transport
        round trip each, 4-5 layers at 1M — the bulk of HNSW's 3x
        sequential-latency gap vs DiskANN in GATES_r04) collapses to a
        single async device dispatch. Returns a DEVICE (B, S) int32 that
        flows into the beam without any host sync."""
        from ..ops.graph import entry_scan

        dev = self._device(corpus)
        if "upper_ids" not in dev:
            return jnp.full((q_dev.shape[0], 1), self.entry, dtype=jnp.int32)
        ids = dev["upper_ids"]
        s_top = int(min(4, ids.shape[0]))
        return entry_scan(q_dev, dev["upper_rows"], ids, live,
                          metric=self.metric, s=s_top)

    def search(self, coll, q: np.ndarray, k: int, mask: Optional[np.ndarray], nprobe: int):
        metric = self.metric
        corpus = coll.corpus()
        if corpus.would_stream():
            # >HBM corpora have no resident array for the beam to score from;
            # HNSW (RAM-tier index in the reference too, hnsw.rs) falls back
            # to the exact blockwise streaming scan. DiskANN's PQ-guided
            # tier is the graph answer for >HBM (diskann.py).
            q2 = np.atleast_2d(q.astype(np.float32))
            dists, ids = corpus.search(q2, k, metric, filter_mask=mask)
            self.last_scanned = int(corpus.n)
            return _finalize_ranked(
                np.asarray(dists, np.float32), np.asarray(ids, np.int64), k, metric)
        dev = self._device(corpus)
        ef = max(int(nprobe or 0), self.ef_search, k)
        if metric is Metric.IP:
            # +25% ef for raw MIPS (same evidence as DiskANN's IP oversample)
            ef = ef * 5 // 4
        q2 = np.atleast_2d(q.astype(np.float32))
        live = corpus.valid_mask(mask)[: self.built_rows]
        qj = jnp.asarray(q2)
        # per-query entry points (B, S): stable executable shape for any
        # batch; the whole entry+beam chain stays on device (no host sync
        # before the pool fetch). For IP the fixed high-norm starts are
        # appended — still a stable shape since S is fixed at build time.
        starts = self._descend(qj, corpus, live)
        if self.metric is Metric.IP:
            from ..ops.graph import entry_scan

            ids_d, rows_d = self._ip_entry_state(corpus)
            parts = [starts,
                     entry_scan(qj, rows_d, ids_d, live,
                                metric=self.metric, s=self.ENTRY_TOP)]
            if len(self.ip_starts):
                parts.append(jnp.broadcast_to(
                    jnp.asarray(self.ip_starts.astype(np.int32))[None, :],
                    (starts.shape[0], len(self.ip_starts))))
            starts = jnp.concatenate(parts, axis=1)
        guided = _PQ_METRIC_KIND.get(metric)
        if guided and not corpus.would_stream():
            # bf16-guided beam over the resident scan array + exact
            # host-mirror rescore of the full ef pool (same layered-search
            # design as DiskANN; the beam keys are proxies, the returned
            # distances are exact f32)
            aux = corpus.bf16_aux()
            _, pool, scanned = beam_search_bf16(
                qj, corpus.data16, aux["mean"], aux["xm"], aux["xc_sq"],
                aux["xsq_true"], dev["layer0"], starts, live,
                metric_kind=guided, beam=ef, max_steps=ef * 2,
            )
            ids, self.last_scanned = fetch_pool_scanned(pool, scanned)
            dists = corpus.rescore(q2, ids, metric)
        else:
            keys, ids, scanned = beam_search(
                qj,
                corpus._data,
                dev["layer0"],
                starts,
                live,
                metric=metric,
                beam=ef,
                max_steps=ef * 2,
                k=k,
            )
            keys, ids, self.last_scanned = fetch_keys_pool_scanned(keys, ids, scanned)
            dists = -keys if metric.ascending else keys

        if self.built_rows < coll.n_rows:
            tail_mask = np.zeros(coll.n_rows, dtype=bool)
            tail_mask[self.built_rows :] = True
            if mask is not None:
                tail_mask &= mask[: coll.n_rows]
            td, ti = corpus.search(q, k, metric, filter_mask=tail_mask)
            if td.shape[1]:
                pad = np.full((dists.shape[0], td.shape[1]),
                              np.inf if metric.ascending else -np.inf, np.float32)
                pad_ids = np.full((dists.shape[0], td.shape[1]), -1, np.int64)
                pad[:, : td.shape[1]] = td
                pad_ids[:, : ti.shape[1]] = ti
                dists = np.concatenate([dists, pad], axis=1)
                ids = np.concatenate([ids, pad_ids], axis=1)
        return _finalize_ranked(dists, ids, k, metric)

    # ── lifecycle ────────────────────────────────────────────────────────

    def on_commit(self, coll) -> None:
        """Incremental layer-0 insert of rows added since the last commit
        (reference: hnsw.rs:784 insert_point, here batched as the Vamana
        link step). The sparse upper layers keep their subsample until the
        growth-fraction rebuild refreshes them — they only seed the descent,
        so a stale subsample costs a few extra beam steps, not recall."""
        n = coll.n_rows
        if n <= self.built_rows:
            return
        base = getattr(self, "_rows_at_build", self.built_rows)
        grown = getattr(self, "_inserted_since_build", 0) + (n - self.built_rows)
        corpus = coll.corpus()
        if corpus.would_stream():
            # >HBM: HNSW search falls back to the exact streaming scan (the
            # graph is unused while streaming), and both in-place linking
            # and a rebuild would need the resident f32 corpus. Defer:
            # built_rows stays put, so the first commit after the corpus is
            # resident again links the whole accumulated tail below.
            return
        if grown > REBUILD_GROWTH_FRACTION * max(base, 1):
            self.rebuild(coll)
            return
        rows_dev = corpus._data[:n].astype(jnp.float32)
        tombs = coll.tombstones.to_bool_array(n)
        live = np.ones(n, dtype=bool)
        live[: len(tombs)] &= ~tombs
        new_ids = np.arange(self.built_rows, n, dtype=np.int64)
        new_ids = new_ids[live[self.built_rows : n]]
        starts = np.unique(
            np.concatenate([[self.entry], self.upper[-1]["nodes"] if self.upper else []])
        ).astype(np.int32)
        self.layer0_np = insert_points(
            self.layer0_np, new_ids, rows_dev, jnp.asarray(starts), live,
            metric=self.metric, r=self.layer0_np.shape[1],
            l_build=max(self.ef_construction // 2, self.m * 2),
            alpha=1.2,
        )
        self._inserted_since_build = grown
        self.built_rows = n
        self._dev = None
        self._ip_entry_dev = None  # sample must track the grown corpus
        self.save(coll)

    def rebuild(self, coll) -> None:
        from . import IndexBuildOptions

        opts = IndexBuildOptions(
            m=self.m, ef_construction=self.ef_construction, ef_search=self.ef_search
        )
        fresh = HNSWIndex.build(coll, self.mode, opts)
        self.__dict__.update(fresh.__dict__)
        self._inserted_since_build = 0
        self._rows_at_build = self.built_rows
