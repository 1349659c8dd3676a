"""Sparse vector store: exact sparse inner-product top-k.

Reference behavior: engine.rs:556-755 (SparseVectorStore — JSONL-persisted
(index, value) records keyed by row, exact IP top-k, engine.rs:6945
sparse_inner_product). Here the store keeps a CSR matrix (scipy) rebuilt
lazily, so a query is one sparse matvec instead of a per-row merge loop.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import msgpack
import numpy as np


def normalize_sparse_entries(entries) -> list[tuple[int, float]]:
    """Accept dict {idx: val} or [(idx, val), ...]; sort by index, sum dups,
    drop zeros, reject negatives indices."""
    if isinstance(entries, dict):
        pairs = list(entries.items())
    else:
        pairs = [(int(i), float(v)) for i, v in entries]
    acc: dict[int, float] = {}
    for i, v in pairs:
        i = int(i)
        v = float(v)
        if i < 0:
            raise ValueError("sparse indices must be non-negative")
        if v != 0.0:
            acc[i] = acc.get(i, 0.0) + v
    return sorted(acc.items())


class SparseVectorStore:
    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._rows: dict[int, list[tuple[int, float]]] = {}
        self._csr = None
        self._row_order: Optional[np.ndarray] = None
        self._load()

    def _load(self) -> None:
        if self.path.exists():
            data = msgpack.unpackb(self.path.read_bytes(), raw=False, strict_map_key=False)
            self._rows = {int(k): [(int(i), float(v)) for i, v in vals] for k, vals in data.items()}

    def save(self) -> None:
        from ..storage.vector_store import write_atomic

        self.path.parent.mkdir(parents=True, exist_ok=True)
        write_atomic(self.path, msgpack.packb(self._rows, use_bin_type=True))

    def is_empty(self) -> bool:
        return not self._rows

    def __len__(self) -> int:
        return len(self._rows)

    def upsert_many(self, iids, vectors) -> None:
        for iid, vec in zip(iids, vectors):
            entries = normalize_sparse_entries(vec)
            if entries:
                self._rows[int(iid)] = entries
            else:
                self._rows.pop(int(iid), None)
        self._csr = None

    def remove_ids(self, iids) -> None:
        for iid in iids:
            self._rows.pop(int(iid), None)
        self._csr = None

    def _build_csr(self):
        from scipy.sparse import csr_matrix

        order = np.array(sorted(self._rows), dtype=np.int64)
        indptr = [0]
        indices = []
        values = []
        for iid in order:
            row = self._rows[int(iid)]
            indices.extend(i for i, _ in row)
            values.extend(v for _, v in row)
            indptr.append(len(indices))
        dim = (max(indices) + 1) if indices else 1
        self._csr = csr_matrix(
            (np.array(values, np.float32), np.array(indices, np.int64), np.array(indptr, np.int64)),
            shape=(len(order), dim),
        )
        self._row_order = order

    def search(
        self,
        query,
        k: int,
        allowed_iids: Optional[set] = None,
        tombstones=None,
    ) -> list[tuple[int, float]]:
        entries = normalize_sparse_entries(query)
        if not entries or not self._rows:
            return []
        if self._csr is None:
            self._build_csr()
        dim = self._csr.shape[1]
        q = np.zeros(dim, dtype=np.float32)
        for i, v in entries:
            if i < dim:
                q[i] = v
        scores = self._csr @ q  # (n_rows,)
        order = np.argsort(-scores, kind="stable")
        out = []
        for pos in order:
            iid = int(self._row_order[pos])
            s = float(scores[pos])
            if s <= 0.0:
                break
            if tombstones is not None and tombstones.get(iid):
                continue
            if allowed_iids is not None and iid not in allowed_iids:
                continue
            out.append((iid, s))
            if len(out) >= k:
                break
        return out
