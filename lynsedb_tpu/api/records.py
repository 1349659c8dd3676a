"""Record normalization shared by the public collection API
(reference: python/lynse/api/_records.py)."""

from __future__ import annotations

from typing import Any, Iterable, Optional

import numpy as np

DOCUMENT_FIELD = "document"


def normalize_id(value) -> str | int:
    if isinstance(value, bool):
        raise TypeError("bool is not a valid ID")
    if isinstance(value, np.integer):
        value = int(value)
    if isinstance(value, int):
        if value < 0:
            raise ValueError("integer IDs must be non-negative")
        return value
    if isinstance(value, str):
        if not value:
            raise ValueError("string IDs cannot be empty")
        return value
    raise TypeError("IDs must be strings or integers")


def normalize_external_ids(ids) -> tuple[list, bool]:
    """Return (id_list, was_single)."""
    if isinstance(ids, (str, int, np.integer)) and not isinstance(ids, bool):
        return [normalize_id(ids)], True
    if isinstance(ids, np.ndarray):
        values = ids.tolist()
    elif isinstance(ids, Iterable) and not isinstance(ids, (str, bytes, dict)):
        values = list(ids)
    else:
        raise TypeError("ids must be a string/int ID or a sequence of string/int IDs")
    if not values:
        raise ValueError("ids cannot be empty")
    return [normalize_id(v) for v in values], False


def validate_unique_external_ids(ids: list) -> None:
    seen = set()
    for v in ids:
        key = ("i", v) if isinstance(v, int) else ("s", v)
        if key in seen:
            raise ValueError(f"duplicate id {v!r} in the same add call")
        seen.add(key)


def normalize_documents(documents, n: Optional[int] = None) -> tuple[Optional[list], bool]:
    if documents is None:
        return None, False
    if isinstance(documents, str):
        docs, single = [documents], True
    elif isinstance(documents, Iterable):
        docs, single = list(documents), False
        for d in docs:
            if not isinstance(d, str):
                raise TypeError("documents must be strings")
    else:
        raise TypeError("documents must be a string or sequence of strings")
    if n is not None and len(docs) != n:
        raise ValueError(f"documents length ({len(docs)}) must match record count ({n})")
    return docs, single


def normalize_vectors(vectors, n: int) -> np.ndarray:
    arr = np.asarray(vectors, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    elif arr.ndim != 2:
        raise ValueError("vectors must be a 1D vector or a 2D matrix")
    if arr.shape[0] != n:
        raise ValueError(f"vectors row count ({arr.shape[0]}) must match ids length ({n})")
    return np.ascontiguousarray(arr)


def normalize_fields(fields, n: int) -> list:
    if fields is None:
        return [None] * n
    if isinstance(fields, dict):
        fields = [fields]
    fields = list(fields)
    if len(fields) != n:
        raise ValueError(f"fields length ({len(fields)}) must match record count ({n})")
    for f in fields:
        if f is not None and not isinstance(f, dict):
            raise TypeError("each fields entry must be a dict or None")
    return fields


def attach_documents(field_list: list, docs: Optional[list]) -> list:
    if docs is None:
        return field_list
    out = []
    for f, d in zip(field_list, docs):
        merged = dict(f) if f else {}
        merged[DOCUMENT_FIELD] = d
        out.append(merged)
    return out
