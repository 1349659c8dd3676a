"""Native f16 codec: build, correctness vs numpy, and product wiring."""

import numpy as np

from lynsedb_tpu import native
from lynsedb_tpu.storage.dtype import cast_rows, decode_f32, rows_to_f32


def test_native_library_builds():
    lib = native.get_lib()
    assert lib is not None, "native library failed to build (toolchain present?)"


def test_f16_roundtrip(rng):
    arr = rng.normal(size=(1000,)).astype(np.float32) * 100
    half = native.f32_to_f16(arr)
    np.testing.assert_array_equal(half, arr.astype(np.float16))
    back = native.f16_to_f32(half)
    np.testing.assert_array_equal(back, half.astype(np.float32))
    # specials
    special = np.array([0.0, -0.0, np.inf, -np.inf, 65504.0, 1e-8], dtype=np.float32)
    np.testing.assert_array_equal(native.f32_to_f16(special), special.astype(np.float16))


def test_f16_matches_numpy_bulk(rng):
    arr = rng.normal(size=(512, 128)).astype(np.float32) * 50
    np.testing.assert_array_equal(native.f32_to_f16(arr), arr.astype(np.float16))
    half = arr.astype(np.float16)
    np.testing.assert_array_equal(native.f16_to_f32(half), half.astype(np.float32))


def test_dtype_codecs_route_f16_through_native(rng):
    """cast_rows/rows_to_f32/decode_f32 are the product entry points behind
    the f16 wire protocol and f16 disk storage."""
    rows = rng.normal(size=(64, 32)).astype(np.float32)
    half = cast_rows(rows, "float16")
    assert half.dtype == np.float16
    np.testing.assert_array_equal(half, rows.astype(np.float16))
    np.testing.assert_array_equal(rows_to_f32(half), half.astype(np.float32))
    # f32 passthrough makes no copy of an already-f32 contiguous array
    same = cast_rows(rows, "float32")
    assert same.dtype == np.float32
    flat = decode_f32(half.tobytes(), "float16")
    np.testing.assert_array_equal(flat, half.reshape(-1).astype(np.float32))
    flat32 = decode_f32(rows.tobytes(), "float32")
    np.testing.assert_array_equal(flat32, rows.reshape(-1))
