// Native host-runtime kernels for LynseDB-TPU.
//
// The reference implements its host plane in Rust (WAL framing + CRC,
// storage codecs, cluster result merging — src/storage/wal.rs,
// src/distance/simd.rs pack_binary, src/cluster.rs merge_search_blocks).
// This library provides the same-role native kernels for the TPU build's
// host plane, exposed through a C ABI consumed via ctypes
// (lynsedb_tpu/native.py). The TPU remains the compute plane; these cover
// the host-side byte-bashing the Python layer shouldn't do in a loop.
//
// Build: cc -O3 -march=native -shared -fPIC lynse_native.cpp -o lynse_native.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// ── CRC32 (zlib polynomial, slice-by-8) ─────────────────────────────────

static uint32_t crc_table[8][256];
static bool crc_init_done = false;

static void crc_init() {
    for (int i = 0; i < 256; i++) {
        uint32_t c = (uint32_t)i;
        for (int j = 0; j < 8; j++)
            c = (c & 1) ? (0xEDB88320u ^ (c >> 1)) : (c >> 1);
        crc_table[0][i] = c;
    }
    for (int i = 0; i < 256; i++)
        for (int s = 1; s < 8; s++)
            crc_table[s][i] =
                (crc_table[s - 1][i] >> 8) ^ crc_table[0][crc_table[s - 1][i] & 0xFF];
    crc_init_done = true;
}

uint32_t lynse_crc32(const uint8_t* data, uint64_t len, uint32_t seed) {
    if (!crc_init_done) crc_init();
    uint32_t c = ~seed;
    while (len >= 8) {
        uint32_t lo, hi;
        memcpy(&lo, data, 4);
        memcpy(&hi, data + 4, 4);
        lo ^= c;
        c = crc_table[7][lo & 0xFF] ^ crc_table[6][(lo >> 8) & 0xFF] ^
            crc_table[5][(lo >> 16) & 0xFF] ^ crc_table[4][lo >> 24] ^
            crc_table[3][hi & 0xFF] ^ crc_table[2][(hi >> 8) & 0xFF] ^
            crc_table[1][(hi >> 16) & 0xFF] ^ crc_table[0][hi >> 24];
        data += 8;
        len -= 8;
    }
    while (len--) c = crc_table[0][(c ^ *data++) & 0xFF] ^ (c >> 8);
    return ~c;
}

// ── WAL record framing: [kind u8][len u64][crc u32][payload] ───────────

// Frames a batch of records into `out` (caller sizes it as
// sum(len + 13)). Returns bytes written.
uint64_t lynse_wal_frame(const uint8_t* payload, uint64_t payload_len,
                         uint8_t kind, uint8_t* out) {
    out[0] = kind;
    memcpy(out + 1, &payload_len, 8);
    uint32_t crc = lynse_crc32(payload, payload_len, 0);
    memcpy(out + 9, &crc, 4);
    memcpy(out + 13, payload, payload_len);
    return 13 + payload_len;
}

// Validates one frame at `data`; writes kind+payload_len through out params.
// Returns payload offset on success, -1 on torn/corrupt record.
int64_t lynse_wal_parse(const uint8_t* data, uint64_t avail,
                        uint8_t* kind, uint64_t* payload_len) {
    if (avail < 13) return -1;
    uint64_t plen;
    memcpy(&plen, data + 1, 8);
    if (13 + plen > avail) return -1;
    uint32_t crc;
    memcpy(&crc, data + 9, 4);
    if (lynse_crc32(data + 13, plen, 0) != crc) return -1;
    *kind = data[0];
    *payload_len = plen;
    return 13;
}

// ── binary packing: f32 rows -> little-endian bit words (>0.5 = 1) ─────

void lynse_pack_bits(const float* src, int64_t n_rows, int64_t dim,
                     uint64_t* out, float threshold) {
    int64_t words = (dim + 63) / 64;
    for (int64_t r = 0; r < n_rows; r++) {
        const float* row = src + r * dim;
        uint64_t* orow = out + r * words;
        memset(orow, 0, (size_t)words * 8);
        for (int64_t i = 0; i < dim; i++)
            if (row[i] > threshold) orow[i >> 6] |= (uint64_t)1 << (i & 63);
    }
}

// ── f32 <-> f16 (IEEE half) batch codecs ────────────────────────────────

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
    for (int64_t i = 0; i < n; i++) dst[i] = f32_to_f16_one(src[i]);
}

void lynse_f16_to_f32(const uint16_t* src, float* dst, int64_t n) {
    for (int64_t i = 0; i < n; i++) dst[i] = f16_to_f32_one(src[i]);
}

// ── top-k merge of concatenated candidate lists ─────────────────────────
// scores (n,), ids (n,): returns top-k by score (descending when
// ascending=0, ascending otherwise), deduplicating ids, skipping id < 0.
// out_idx receives source positions; returns count written (<= k).

int64_t lynse_merge_topk(const float* scores, const int64_t* ids, int64_t n,
                         int64_t k, int ascending, int64_t* out_idx) {
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; i++) order[i] = i;
    if (ascending)
        std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
            return scores[a] < scores[b];
        });
    else
        std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
            return scores[a] > scores[b];
        });
    std::vector<int64_t> seen;
    seen.reserve((size_t)k * 2);
    int64_t written = 0;
    for (int64_t i = 0; i < n && written < k; i++) {
        int64_t pos = order[i];
        int64_t id = ids[pos];
        if (id < 0) continue;
        bool dup = false;
        for (int64_t s : seen)
            if (s == id) { dup = true; break; }
        if (dup) continue;
        seen.push_back(id);
        out_idx[written++] = pos;
    }
    return written;
}

}  // extern "C"
