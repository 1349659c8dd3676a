"""IVF / SPANN partition indexes, TPU-native.

Reference behavior: src/index/ivf.rs:19 (k-means coarse centroids, inverted
lists, nprobe probing, incremental insert to nearest centroid) and
src/index/spann.rs:24 (boundary replicas: rows posted to <= replica_count
closest centroids, probe + dedup + exact re-rank).

TPU formulation (Lance-style IVF_FLAT, cf. storage/ivf_flat_mmap.rs:22, but
device-resident): rows are gathered into **cluster-contiguous padded blocks**
in HBM. A query scores the centroid table (one small matmul), takes the top
``nprobe`` clusters, gathers their blocks with contiguous DMA, and runs the
fused distance+top-k over just those rows — compute scales with nprobe/K, not
corpus size. Rows added after build accumulate in an exactly-scanned tail
(merged per query) until a rebuild threshold.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import Metric
from ..ops import distance as D
from ..ops.kmeans import train_kmeans
from ..ops.scan import _pack_ids, unpack_search_step
from ..ops.topk import masked_top_k, merge_top_k
from ..storage.vector_store import write_atomic

BLOCK_SIZE = 2048
DEFAULT_N_CLUSTERS = 256
DEFAULT_NPROBE = 32
DEFAULT_REPLICAS = 1
TAIL_REBUILD_FRACTION = 0.2


@partial(jax.jit, static_argnames=("k", "nprobe", "metric", "ascending"))
def _ivf_search_kernel(
    q: jnp.ndarray,  # (B, D)
    centroids: jnp.ndarray,  # (Kc, D)
    blocks: jnp.ndarray,  # (n_blocks, BS, D) cluster-sorted rows
    block_orig: jnp.ndarray,  # (n_blocks, BS) original row id or -1
    cluster_blocks: jnp.ndarray,  # (Kc, max_bpc) block ids, -1 padded
    live: jnp.ndarray,  # (N_live_pad,) bool — in-range, untombed, filter-passing
    *,
    k: int,
    nprobe: int,
    metric: Metric,
    ascending: bool,
):
    kc = centroids.shape[0]
    nprobe = min(nprobe, kc)
    qt = D.query_transform(q, metric)
    cent_scores = D.pairwise(qt, D.corpus_transform(centroids, metric), metric)
    keyed = -cent_scores if ascending else cent_scores
    _, top_c = jax.lax.top_k(keyed, nprobe)  # (B, nprobe)

    budget = nprobe * cluster_blocks.shape[1]
    blk = cluster_blocks[top_c].reshape(q.shape[0], budget)  # (B, budget)

    def one(q_row, blk_q):
        safe = jnp.maximum(blk_q, 0)
        rows = blocks[safe].reshape(-1, blocks.shape[-1])  # (budget*BS, D)
        orig = jnp.where(
            (blk_q >= 0)[:, None], block_orig[safe], -1
        ).reshape(-1)  # (budget*BS,)
        valid = (orig >= 0) & live[jnp.maximum(orig, 0)]
        ct = D.corpus_transform(rows * valid[:, None].astype(rows.dtype), metric)
        qt1 = D.query_transform(q_row[None], metric)
        scores = D.pairwise(qt1, ct, metric)[0]
        d, idx = masked_top_k(scores[None, :], k, ascending, valid[None, :])
        return d[0], orig[idx[0]]

    dists, ids = jax.lax.map(lambda args: one(*args), (q, blk))
    # pack (dists, id-hi, id-lo) into one (B, 3k) array: the caller pays ONE
    # device->host fetch (~33 ms through the serving tunnel) instead of two
    return _pack_ids(dists, ids)


class IVFIndex:
    """IVF (and SPANN when replica_count > 1) over device-resident blocks."""

    kind = "ivf"

    def __init__(self, coll, mode, opts, centroids: np.ndarray, postings: np.ndarray,
                 built_rows: int, replica_count: int):
        self.mode = mode
        self.metric: Metric = mode.metric
        self.n_clusters = centroids.shape[0]
        self.nprobe_default = opts.nprobe or DEFAULT_NPROBE
        self.replica_count = replica_count
        self.centroids_np = centroids
        self.postings = postings  # (M, 2) [cluster, row] pairs, cluster-sorted
        self.built_rows = built_rows
        self.kind = "spann" if replica_count > 1 else "ivf"
        # device state (lazy)
        self._dev = None

    # ── build ────────────────────────────────────────────────────────────

    @classmethod
    def build(cls, coll, mode, opts) -> "IVFIndex":
        data = coll.store.read_all()
        n = data.shape[0]
        if n == 0:
            raise ValueError("cannot build an IVF index on an empty collection")
        n_clusters = opts.n_clusters or DEFAULT_N_CLUSTERS
        n_clusters = max(1, min(n_clusters, n))
        normalize = mode.metric is Metric.COSINE
        binarize = mode.metric.is_binary
        assign_ip = mode.metric is Metric.IP
        if mode.family == "SPANN":
            replicas = opts.replica_count or DEFAULT_REPLICAS
        elif assign_ip:
            # the MIPS Voronoi is leaky (a row's best-IP centroid often
            # outranks the probe list's tail); boundary replicas restore
            # probe coverage the same way SPANN's do (measured at 100k/256
            # clusters/nprobe=32: coverage 0.845 single vs >0.93 with 2)
            replicas = opts.replica_count or 2
        else:
            replicas = 1
        train_data = (data > 0.5).astype(np.float32) if binarize else data
        centroids, assigns = train_kmeans(
            train_data, n_clusters, normalize=normalize, assign_ip=assign_ip, seed=42
        )

        if replicas > 1:
            postings = cls._replica_postings(train_data, centroids, replicas, ip=assign_ip)
        else:
            postings = np.stack([assigns.astype(np.int32), np.arange(n, dtype=np.int32)], axis=1)
        order = np.argsort(postings[:, 0], kind="stable")
        postings = postings[order]

        idx = cls(coll, mode, opts, centroids.astype(np.float32), postings, n, replicas)
        idx.save(coll)
        return idx

    @staticmethod
    def _replica_postings(data: np.ndarray, centroids: np.ndarray, replicas: int,
                          ip: bool = False) -> np.ndarray:
        """SPANN boundary replicas: each row posts to its <= R closest
        centroids (reference: spann.rs:130). ``ip`` ranks centroids by
        max-inner-product (IP-metric routing, matching the probe order)."""
        from ..ops.kmeans import _ip_scores, _l2_scores

        n = data.shape[0]
        r = min(replicas, centroids.shape[0])
        chunk = 65536
        n_pad = ((n + chunk - 1) // chunk) * chunk
        padded = np.zeros((n_pad, data.shape[1]), dtype=np.float32)
        padded[:n] = data
        c = jnp.asarray(centroids)
        c_sq = jnp.sum(c * c, axis=-1)

        @jax.jit
        def top_r(x):
            keyed = _ip_scores(x, c) if ip else -_l2_scores(x, c, c_sq)
            _, idx = jax.lax.top_k(keyed, r)
            return idx

        tops = np.concatenate(
            [np.asarray(top_r(jnp.asarray(padded[i : i + chunk]))) for i in range(0, n_pad, chunk)]
        )[:n]
        rows = np.repeat(np.arange(n, dtype=np.int32), r)
        clusters = tops.astype(np.int32).reshape(-1)
        return np.stack([clusters, rows], axis=1)

    # ── persistence ──────────────────────────────────────────────────────

    def save(self, coll) -> None:
        idx_dir = coll.root / "index"
        idx_dir.mkdir(parents=True, exist_ok=True)
        np.savez(
            idx_dir / "ivf.npz",
            centroids=self.centroids_np,
            postings=self.postings,
        )
        write_atomic(
            idx_dir / "ivf_meta.json",
            json.dumps(
                {
                    "built_rows": self.built_rows,
                    "replica_count": self.replica_count,
                    "nprobe": self.nprobe_default,
                }
            ).encode(),
        )

    @classmethod
    def load(cls, coll, mode, opts) -> Optional["IVFIndex"]:
        idx_dir = coll.root / "index"
        path = idx_dir / "ivf.npz"
        if not path.exists():
            return None
        data = np.load(path)
        meta = json.loads((idx_dir / "ivf_meta.json").read_text())
        return cls(
            coll,
            mode,
            opts,
            data["centroids"],
            data["postings"],
            meta["built_rows"],
            meta["replica_count"],
        )

    # ── device layout ────────────────────────────────────────────────────

    def _device_state(self, coll):
        if self._dev is not None:
            return self._dev
        corpus = coll.corpus()  # ensures device rows are current
        n_blocks_per_cluster = np.zeros(self.n_clusters, dtype=np.int64)
        clusters = self.postings[:, 0]
        rows = self.postings[:, 1]
        counts = np.bincount(clusters, minlength=self.n_clusters)
        bpc = np.maximum((counts + BLOCK_SIZE - 1) // BLOCK_SIZE, 0)
        max_bpc = max(int(bpc.max(initial=1)), 1)
        n_blocks = int(bpc.sum()) or 1

        block_orig = np.full((n_blocks, BLOCK_SIZE), -1, dtype=np.int32)
        cluster_blocks = np.full((self.n_clusters, max_bpc), -1, dtype=np.int32)
        next_block = 0
        offsets = np.concatenate([[0], np.cumsum(counts)])
        for c in range(self.n_clusters):
            rows_c = rows[offsets[c] : offsets[c + 1]]
            nb = int(bpc[c])
            for b in range(nb):
                cluster_blocks[c, b] = next_block
                seg = rows_c[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE]
                block_orig[next_block, : len(seg)] = seg
                next_block += 1
        # gather rows on device in block order
        flat_ids = block_orig.reshape(-1)
        safe_ids = np.maximum(flat_ids, 0)
        blocks = corpus._data[jnp.asarray(safe_ids)].astype(jnp.float32)
        blocks = blocks * jnp.asarray(flat_ids >= 0, dtype=jnp.float32)[:, None]
        blocks = blocks.reshape(n_blocks, BLOCK_SIZE, -1)
        self._dev = {
            "centroids": jnp.asarray(self.centroids_np),
            "blocks": blocks,
            "block_orig": jnp.asarray(block_orig),
            "cluster_blocks": jnp.asarray(cluster_blocks),
        }
        return self._dev

    # ── search ───────────────────────────────────────────────────────────

    def search(self, coll, q: np.ndarray, k: int, mask: Optional[np.ndarray], nprobe: int):
        metric = self.metric
        nprobe = int(nprobe or self.nprobe_default)
        dev = self._device_state(coll)
        corpus = coll.corpus()
        live = corpus.valid_mask(mask)
        fetch = k * 2 if self.replica_count > 1 else k
        qj = jnp.asarray(np.atleast_2d(q.astype(np.float32)))
        if metric.is_binary:
            qj = (qj > 0.5).astype(jnp.float32)
        # honest profile figure (engine.rs:6906): rows in the probed
        # clusters. Device slots are block-padded, so scale the probed slot
        # count by the global fill factor (real rows / total slots).
        total_slots = max(dev["blocks"].shape[0] * dev["blocks"].shape[1], 1)
        probed_slots = (
            min(nprobe, dev["centroids"].shape[0])
            * dev["cluster_blocks"].shape[1]
            * dev["blocks"].shape[1]
        )
        fill = min(self.built_rows / total_slots, 1.0)
        self.last_scanned = min(int(round(probed_slots * fill)), self.built_rows)
        packed = _ivf_search_kernel(
            qj,
            dev["centroids"],
            dev["blocks"],
            dev["block_orig"],
            dev["cluster_blocks"],
            live,
            k=fetch,
            nprobe=nprobe,
            metric=metric,
            ascending=metric.ascending,
        )
        dists, ids = unpack_search_step(np.asarray(packed))  # one host sync

        # exact-scanned tail for rows added after build
        if self.built_rows < coll.n_rows:
            tail_mask = np.zeros(coll.n_rows, dtype=bool)
            tail_mask[self.built_rows :] = True
            if mask is not None:
                tail_mask &= mask[: coll.n_rows]
            td, ti = corpus.search(q, k, metric, filter_mask=tail_mask)
            width = td.shape[1]
            if width:
                pad = np.full((dists.shape[0], width), np.inf if metric.ascending else -np.inf, np.float32)
                pad_ids = np.full((dists.shape[0], width), -1, np.int64)
                pad[:, : td.shape[1]] = td
                pad_ids[:, : ti.shape[1]] = ti
                dists = np.concatenate([dists, pad], axis=1)
                ids = np.concatenate([ids, pad_ids], axis=1)

        return self._finalize(dists, ids, k, metric)

    def _finalize(self, dists: np.ndarray, ids: np.ndarray, k: int, metric: Metric):
        """Order, dedup (SPANN replicas), trim invalid, truncate to k."""
        b = dists.shape[0]
        keyed = -dists if metric.ascending else dists
        out_d = []
        out_i = []
        for r in range(b):
            order = np.argsort(-keyed[r], kind="stable")
            seen = set()
            dd, ii = [], []
            for j in order:
                rid = int(ids[r, j])
                if rid < 0 or not np.isfinite(keyed[r, j]):
                    continue
                if rid in seen:
                    continue
                seen.add(rid)
                dd.append(dists[r, j])
                ii.append(rid)
                if len(ii) >= k:
                    break
            out_d.append(dd)
            out_i.append(ii)
        width = max((len(x) for x in out_i), default=0)
        d_arr = np.zeros((b, width), dtype=np.float32)
        i_arr = np.full((b, width), -1, dtype=np.int64)
        for r in range(b):
            d_arr[r, : len(out_d[r])] = out_d[r]
            i_arr[r, : len(out_i[r])] = out_i[r]
        return d_arr, i_arr

    # ── lifecycle ────────────────────────────────────────────────────────

    def on_commit(self, coll) -> None:
        """Incremental insert: rows added since the last commit are assigned
        to their nearest existing centroid(s) and appended to the postings
        (reference: ivf.rs incremental insert / spann boundary replicas) —
        the blocked device layout regenerates lazily. K-means retrains only
        once accumulated growth passes half the trained corpus (centroid
        drift), mirroring the graph indexes' rebuild-as-backstop policy."""
        n = coll.n_rows
        if n <= self.built_rows:
            return
        base = getattr(self, "_rows_at_train", self.built_rows)
        grown = getattr(self, "_inserted_since_train", 0) + (n - self.built_rows)
        if grown > 0.5 * max(base, 1):
            self.rebuild(coll)
            return
        corpus = coll.corpus()
        new_rows = corpus.host_rows(np.arange(self.built_rows, n))
        if self.metric.is_binary:
            new_rows = (new_rows > 0.5).astype(np.float32)
        elif self.metric is Metric.COSINE:
            norms = np.linalg.norm(new_rows, axis=1, keepdims=True)
            new_rows = new_rows / np.maximum(norms, 1e-30)
        r = self.replica_count if self.replica_count > 1 else 1
        fresh = self._replica_postings(new_rows, self.centroids_np, r,
                                       ip=self.metric is Metric.IP)
        fresh[:, 1] += self.built_rows  # local row index -> global row id
        merged = np.concatenate([self.postings, fresh.astype(self.postings.dtype)])
        order = np.argsort(merged[:, 0], kind="stable")
        self.postings = merged[order]
        self.built_rows = n
        self._inserted_since_train = grown
        self._dev = None  # blocked layout regenerates on next search
        self.save(coll)

    def rebuild(self, coll) -> None:
        from . import IndexBuildOptions

        opts = IndexBuildOptions(
            n_clusters=self.n_clusters,
            nprobe=self.nprobe_default,
            replica_count=self.replica_count if self.replica_count > 1 else None,
        )
        fresh = IVFIndex.build(coll, self.mode, opts)
        self.__dict__.update(fresh.__dict__)
        self._inserted_since_train = 0
        self._rows_at_train = self.built_rows
