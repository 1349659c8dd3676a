"""Vector storage dtypes (reference: src/storage/dtype.rs)."""

from __future__ import annotations

import numpy as np

_DTYPES = {
    "float32": (np.float32, 4),
    "float16": (np.float16, 2),
}


def parse_dtype(name: str):
    key = str(name).lower()
    if key in ("f32", "float", "float32"):
        key = "float32"
    elif key in ("f16", "half", "float16"):
        key = "float16"
    if key not in _DTYPES:
        raise ValueError(f"unsupported vector dtype: {name!r} (float32/float16)")
    return key


def np_dtype(name: str):
    return _DTYPES[parse_dtype(name)][0]


def byte_width(name: str) -> int:
    return _DTYPES[parse_dtype(name)][1]
