"""SIFT-format loaders: .fvecs / .ivecs / .bvecs (reference:
benchmarks/sift_io.py behavior — little-endian [dim i32][dim values] rows)."""

from __future__ import annotations

import numpy as np


def read_fvecs(path: str, limit: int | None = None) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.int32)
    dim = int(raw[0])
    rows = raw.reshape(-1, dim + 1)
    if limit is not None:
        rows = rows[:limit]
    return rows[:, 1:].view(np.float32).copy()


def read_ivecs(path: str, limit: int | None = None) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.int32)
    dim = int(raw[0])
    rows = raw.reshape(-1, dim + 1)
    if limit is not None:
        rows = rows[:limit]
    return rows[:, 1:].copy()


def read_bvecs(path: str, limit: int | None = None) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.uint8)
    dim = int(np.frombuffer(raw[:4].tobytes(), dtype=np.int32)[0])
    row_bytes = 4 + dim
    rows = raw.reshape(-1, row_bytes)
    if limit is not None:
        rows = rows[:limit]
    return rows[:, 4:].astype(np.float32)
