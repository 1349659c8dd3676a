// Native host-plane codec for LynseDB-TPU: batched f32 <-> f16 conversion.
//
// The reference does its wire/disk f16 codec work in Rust
// (src/storage/dtype.rs:5-50, src/distance/simd.rs f16 decode family). In
// the TPU build, f16 appears on the host plane only as a *byte format* —
// the f16 wire protocol (client/server/RPC vector payloads) and the f16
// on-disk storage dtype — so the one native kernel that pays for itself is
// the bulk codec: it measured 2.1x numpy's astype on this image's
// toolchain (scalar path), more with F16C.
//
// Earlier revisions also carried CRC32, WAL framing, bit packing and a
// cluster top-k merge; all were deleted after microbenches showed the
// Python stack's existing primitives win at product shapes (zlib.crc32 is
// 2.3x faster than a slice-by-8 C loop here; numpy argsort beats the
// ctypes round trip at coordinator merge sizes).
//
// Build: cc -O3 [-march=native] -shared -fPIC lynse_native.cpp -o lynse_native.so

#include <cstdint>
#include <cstring>

#if defined(__F16C__)
#include <immintrin.h>
#endif

extern "C" {

static inline uint16_t f32_to_f16_one(float f) {
    uint32_t x;
    memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = x & 0x7FFFFFu;
    if (exp >= 31) return (uint16_t)(sign | 0x7C00u | (((x & 0x7F800000u) == 0x7F800000u && mant) ? 0x200u : 0));
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000u;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half = (mant >> shift) + ((mant >> (shift - 1)) & 1);
        return (uint16_t)(sign | half);
    }
    uint32_t half = ((uint32_t)exp << 10) | (mant >> 13);
    half += (mant >> 12) & 1; // round-to-nearest
    return (uint16_t)(sign | half);
}

static inline float f16_to_f32_one(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FFu;
    uint32_t out;
    if (exp == 0) {
        if (mant == 0) out = sign;
        else {
            int e = -1;
            do { mant <<= 1; e++; } while (!(mant & 0x400u));
            out = sign | ((uint32_t)(127 - 15 - e) << 23) | ((mant & 0x3FFu) << 13);
        }
    } else if (exp == 31) {
        out = sign | 0x7F800000u | (mant << 13);
    } else {
        out = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    memcpy(&f, &out, 4);
    return f;
}

void lynse_f32_to_f16(const float* src, uint16_t* dst, int64_t n) {
    int64_t i = 0;
#if defined(__F16C__)
    for (; i + 8 <= n; i += 8) {
        __m256 v = _mm256_loadu_ps(src + i);
        __m128i h = _mm256_cvtps_ph(v, _MM_FROUND_TO_NEAREST_INT | _MM_FROUND_NO_EXC);
        _mm_storeu_si128((__m128i*)(dst + i), h);
    }
#endif
    for (; i < n; i++) dst[i] = f32_to_f16_one(src[i]);
}

void lynse_f16_to_f32(const uint16_t* src, float* dst, int64_t n) {
    int64_t i = 0;
#if defined(__F16C__)
    for (; i + 8 <= n; i += 8) {
        __m128i h = _mm_loadu_si128((const __m128i*)(src + i));
        _mm256_storeu_ps(dst + i, _mm256_cvtph_ps(h));
    }
#endif
    for (; i < n; i++) dst[i] = f16_to_f32_one(src[i]);
}

}  // extern "C"
