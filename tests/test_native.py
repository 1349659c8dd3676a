"""Native C++ host-runtime library: build, correctness vs numpy fallbacks."""

import zlib

import numpy as np
import pytest

from lynsedb_tpu import native


def test_native_library_builds():
    lib = native.get_lib()
    assert lib is not None, "native library failed to build (toolchain present?)"


def test_crc32_matches_zlib(rng):
    data = rng.bytes(100_000)
    assert native.crc32(data) == zlib.crc32(data)
    assert native.crc32(b"") == zlib.crc32(b"")
    assert native.crc32(data, 1234) == zlib.crc32(data, 1234)


def test_pack_bits_matches_numpy(rng):
    rows = rng.normal(size=(17, 130)).astype(np.float32)
    got = native.pack_bits(rows)
    bits = (rows > 0.5).astype(np.uint8)
    padded = np.zeros((17, 192), dtype=np.uint8)
    padded[:, :130] = bits
    want = np.packbits(padded, axis=1, bitorder="little").view(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_f16_roundtrip(rng):
    arr = rng.normal(size=(1000,)).astype(np.float32) * 100
    half = native.f32_to_f16(arr)
    np.testing.assert_array_equal(half, arr.astype(np.float16))
    back = native.f16_to_f32(half)
    np.testing.assert_array_equal(back, half.astype(np.float32))
    # specials
    special = np.array([0.0, -0.0, np.inf, -np.inf, 65504.0, 1e-8], dtype=np.float32)
    np.testing.assert_array_equal(native.f32_to_f16(special), special.astype(np.float16))


def test_merge_topk(rng):
    scores = np.array([0.5, 0.1, 0.9, 0.1, 0.3], dtype=np.float32)
    ids = np.array([10, 11, 12, 10, -1], dtype=np.int64)
    pos = native.merge_topk(scores, ids, 3, ascending=True)
    assert ids[pos].tolist() == [11, 10, 12]  # dedup id 10, skip -1
    pos = native.merge_topk(scores, ids, 2, ascending=False)
    assert ids[pos].tolist() == [12, 10]
