"""ctypes bindings for the native f16 codec (native/lynse_native.cpp).

Compiled on first use into ``~/.lynsedb_tpu/`` (or LYNSE_NATIVE_DIR); both
entry points have pure-numpy fallbacks so the framework runs without a
toolchain. This is the host-plane byte codec behind the f16 wire protocol
and the f16 on-disk storage dtype (consumed via storage/dtype.py) — the
reference's equivalent lives in Rust (src/storage/dtype.rs:5-50).

Set LYNSE_NATIVE=0 to force the numpy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "lynse_native.cpp"
_LIB_DIR = Path(os.environ.get("LYNSE_NATIVE_DIR", Path.home() / ".lynsedb_tpu"))
_LIB_PATH = _LIB_DIR / "lynse_native_v2.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[Path]:
    if not _SRC.exists():
        return None
    _LIB_DIR.mkdir(parents=True, exist_ok=True)
    base = ["-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB_PATH)]
    for cc in ("c++", "g++", "clang++"):
        # prefer -march=native (enables the F16C vector path); fall back to
        # a portable build on toolchains that reject it
        for extra in (["-march=native"], []):
            try:
                subprocess.run([cc, *extra, *base], check=True,
                               capture_output=True, timeout=120)
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
        lib.lynse_f32_to_f16.restype = None
        lib.lynse_f16_to_f32.restype = None
    except (OSError, AttributeError):
        return None
    _lib = lib
    return _lib


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
