"""ResultView — unified result container for all query operations.

API-compatible with the reference's ResultView
(reference: python/lynse/result_view.py:75 — ids/distances/vectors/fields,
tuple unpacking, slicing, to_* conversions, rich repr).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .metrics import Metric


def _parse_index_mode(index_mode: Optional[str]) -> Tuple[str, str]:
    """Extract (index_type, distance_metric) from an index mode string."""
    if not index_mode:
        return ("Flat", "IP")
    family = index_mode.upper().split("-")[0]
    idx_type = {
        "FLAT": "Flat",
        "IVF": "IVF",
        "SPANN": "SPANN",
        "HNSW": "HNSW",
        "DISKANN": "DiskANN",
    }.get(family, family)
    metric = Metric.from_index_mode(index_mode)
    return idx_type, (metric.display_name if metric else "IP")


class ResultView:
    __slots__ = (
        "_ids",
        "_distances",
        "_vectors",
        "_fields",
        "_k",
        "_distance",
        "_index",
        "_result_type",
        "_components",
    )

    def __init__(
        self,
        *,
        ids: Optional[np.ndarray] = None,
        distances: Optional[np.ndarray] = None,
        vectors: Optional[np.ndarray] = None,
        fields: Optional[List[Dict[str, Any]]] = None,
        k: Optional[int] = None,
        distance: Optional[str] = None,
        index: Optional[str] = None,
        result_type: str = "search",
    ):
        self._ids = ids
        self._distances = distances
        self._vectors = vectors
        self._fields = fields if fields is not None else []
        self._k = k
        self._distance = distance
        self._index = index
        self._result_type = result_type
        comps = []
        if ids is not None:
            comps.append(("ids", self._ids))
        if distances is not None:
            comps.append(("distances", self._distances))
        if vectors is not None:
            comps.append(("vectors", self._vectors))
        if self._fields:
            comps.append(("fields", self._fields))
        self._components = comps

    # ── accessors ────────────────────────────────────────────────────────

    @property
    def ids(self):
        return self._ids

    @property
    def distances(self):
        return self._distances

    @property
    def vectors(self):
        return self._vectors

    @property
    def fields(self):
        return self._fields

    @property
    def k(self):
        return self._k

    @property
    def distance_metric(self):
        return self._distance

    @property
    def index_type(self):
        return self._index

    @property
    def result_type(self):
        return self._result_type

    # ── container protocol ───────────────────────────────────────────────

    def __len__(self) -> int:
        for _, comp in self._components:
            return len(comp)
        return 0

    def __iter__(self):
        return iter(comp for _, comp in self._components)

    def __getitem__(self, item):
        if isinstance(item, int) and not isinstance(item, bool):
            if 0 <= item < len(self._components) or -len(self._components) <= item < 0:
                return self._components[item][1]
            raise IndexError(item)
        if isinstance(item, slice):
            return ResultView(
                ids=self._ids[item] if self._ids is not None else None,
                distances=self._distances[item] if self._distances is not None else None,
                vectors=self._vectors[item] if self._vectors is not None else None,
                fields=self._fields[item] if self._fields else None,
                k=len(self._ids[item]) if self._ids is not None else self._k,
                distance=self._distance,
                index=self._index,
                result_type=self._result_type,
            )
        raise TypeError(f"invalid index: {item!r}")

    def __eq__(self, other):
        if isinstance(other, tuple):
            return tuple(comp for _, comp in self._components) == other
        if not isinstance(other, ResultView):
            return NotImplemented
        if len(self._components) != len(other._components):
            return False
        for (n1, c1), (n2, c2) in zip(self._components, other._components):
            if n1 != n2:
                return False
            if isinstance(c1, np.ndarray):
                if not np.array_equal(c1, np.asarray(c2)):
                    return False
            elif c1 != c2:
                return False
        return True

    # ── conversions ──────────────────────────────────────────────────────

    def to_list(self) -> list:
        out = []
        n = len(self._ids) if self._ids is not None else 0
        for i in range(n):
            rec = {"id": self._ids[i].item() if hasattr(self._ids[i], "item") else self._ids[i]}
            if self._distances is not None:
                rec["distance"] = float(self._distances[i])
            if self._vectors is not None:
                rec["vector"] = np.asarray(self._vectors[i]).tolist()
            if self._fields:
                rec["fields"] = self._fields[i]
            out.append(rec)
        return out

    def to_dict(self) -> dict:
        out: Dict[str, Any] = {}
        if self._ids is not None:
            out["ids"] = np.asarray(self._ids).tolist()
        if self._distances is not None:
            out["distances"] = np.asarray(self._distances).tolist()
        if self._vectors is not None:
            out["vectors"] = np.asarray(self._vectors).tolist()
        if self._fields:
            out["fields"] = self._fields
        return out

    def to_numpy(self):
        if self._vectors is not None:
            return np.asarray(self._vectors)
        if self._distances is not None:
            return np.asarray(self._distances)
        return np.asarray(self._ids)

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    def to_pandas(self):
        import pandas as pd

        return pd.DataFrame(self.to_list())

    def to_polars(self):
        import polars as pl  # optional dependency

        return pl.DataFrame(self.to_list())

    def to_arrow(self):
        import pyarrow as pa

        return pa.Table.from_pylist(self.to_list())

    # ── repr ─────────────────────────────────────────────────────────────

    def __repr__(self) -> str:
        parts = [f"ResultView(type={self._result_type!r}"]
        if self._ids is not None:
            preview = np.asarray(self._ids)[:5]
            parts.append(f"n={len(self._ids)}, ids={preview.tolist()}...")
        if self._distances is not None:
            parts.append(f"distances={np.round(np.asarray(self._distances)[:5], 4).tolist()}...")
        if self._distance:
            parts.append(f"metric={self._distance}")
        if self._index:
            parts.append(f"index={self._index}")
        return ", ".join(parts) + ")"

    __str__ = __repr__
