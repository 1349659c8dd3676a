"""ctypes bindings for the native host-runtime library (native/lynse_native.cpp).

Compiled on first use into ``~/.lynsedb_tpu/`` (or LYNSE_NATIVE_DIR); every
entry point has a pure-numpy fallback so the framework runs without a
toolchain. The native layer covers the host-plane byte work the reference
does in Rust: CRC32, WAL framing, binary bit packing, f16 codecs, and the
cluster top-k merge.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import zlib
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "lynse_native.cpp"
_LIB_DIR = Path(os.environ.get("LYNSE_NATIVE_DIR", Path.home() / ".lynsedb_tpu"))
_LIB_PATH = _LIB_DIR / "lynse_native.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[Path]:
    if not _SRC.exists():
        return None
    _LIB_DIR.mkdir(parents=True, exist_ok=True)
    for cc in ("c++", "g++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB_PATH)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return _LIB_PATH
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("LYNSE_NATIVE", "1") == "0":
        return None
    path = _LIB_PATH if _LIB_PATH.exists() else _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.lynse_crc32.restype = ctypes.c_uint32
    lib.lynse_crc32.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32]
    lib.lynse_pack_bits.restype = None
    lib.lynse_merge_topk.restype = ctypes.c_int64
    lib.lynse_f32_to_f16.restype = None
    lib.lynse_f16_to_f32.restype = None
    _lib = lib
    return _lib


# ── public wrappers (native + numpy fallbacks) ──────────────────────────


def crc32(data: bytes, seed: int = 0) -> int:
    lib = get_lib()
    if lib is not None:
        return int(lib.lynse_crc32(data, len(data), seed))
    return zlib.crc32(data, seed)


def pack_bits(rows: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    """f32 (N, D) -> packed little-endian u64 words (N, ceil(D/64))."""
    rows = np.ascontiguousarray(rows, dtype=np.float32)
    n, d = rows.shape
    words = (d + 63) // 64
    lib = get_lib()
    if lib is not None:
        out = np.zeros((n, words), dtype=np.uint64)
        lib.lynse_pack_bits(
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n),
            ctypes.c_int64(d),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.c_float(threshold),
        )
        return out
    bits = (rows > threshold).astype(np.uint8)
    padded = np.zeros((n, words * 64), dtype=np.uint8)
    padded[:, :d] = bits
    return np.packbits(padded, axis=1, bitorder="little").view(np.uint64)


def f32_to_f16(arr: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(arr.shape, dtype=np.uint16)
        lib.lynse_f32_to_f16(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.c_int64(arr.size),
        )
        return out.view(np.float16)
    return arr.astype(np.float16)


def f16_to_f32(arr: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(arr, dtype=np.float16)
    lib = get_lib()
    if lib is not None:
        out = np.empty(arr.shape, dtype=np.float32)
        lib.lynse_f16_to_f32(
            arr.view(np.uint16).ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(arr.size),
        )
        return out
    return arr.astype(np.float32)


def merge_topk(scores: np.ndarray, ids: np.ndarray, k: int, ascending: bool):
    """Dedup top-k over concatenated candidate lists. Returns positions into
    the input arrays (best-first)."""
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    lib = get_lib()
    if lib is not None:
        out = np.empty(min(k, len(ids)), dtype=np.int64)
        n = lib.lynse_merge_topk(
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(len(ids)),
            ctypes.c_int64(k),
            ctypes.c_int(1 if ascending else 0),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out[:n]
    order = np.argsort(scores if ascending else -scores, kind="stable")
    seen: set = set()
    out = []
    for pos in order:
        rid = int(ids[pos])
        if rid < 0 or rid in seen:
            continue
        seen.add(rid)
        out.append(pos)
        if len(out) >= k:
            break
    return np.asarray(out, dtype=np.int64)
