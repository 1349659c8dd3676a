"""Quantized-scan kernels: SQ8, PQ, RaBitQ, PolarVec — TPU-first.

Reference behavior (semantics, not design): quantizer trait + SQ8/Binary/PQ
codecs (src/quantizer/mod.rs:34-698), PQ ADC LUT scan (storage/pq_mmap.rs:46),
RaBitQ 1-bit with randomized Hadamard transform (storage/rabitq_mmap.rs:49),
PolarVec training-free multi-bit (storage/polarvec_mmap.rs:74). All are
shortlist producers followed by exact f32 re-rank.

TPU formulation: every scan lowers to an int8 MXU matmul plus rank-1
corrections —

  SQ8      x ~ lo_d + (c+128)*s_d       -> q.x ~ q.lo' + (q*s).c
  RaBitQ   rot(x) ~ alpha * sgn         -> q.x ~ alpha * (rot(q).sgn)
  PolarVec rot(x) ~ lo_r + c*s_r        -> q.x ~ lo_r*sum(rot(q)) + s_r*(rot(q).c)
  PQ       ADC: per-subspace codebook lookup, summed

where the Hadamard rotation is itself a log-D sequence of reshaped adds
(pure VPU). Codes are stored as int8 on device (4x HBM traffic reduction vs
f32; 1-bit physical packing is a later Pallas optimization).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# ── Hadamard rotation ────────────────────────────────────────────────────


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def fwht(x: jnp.ndarray) -> jnp.ndarray:
    """Fast Walsh-Hadamard transform along the last axis (power-of-2 dim),
    normalized by 1/sqrt(D) so it is orthonormal."""
    d = x.shape[-1]
    h = 1
    while h < d:
        x = x.reshape(x.shape[:-1] + (d // (2 * h), 2, h))
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = jnp.concatenate([a + b, a - b], axis=-1).reshape(x.shape[:-3] + (d,))
        h *= 2
    return x / jnp.sqrt(jnp.float32(d))


def rotation_signs(dim_pad: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim_pad)


def rotate(x: np.ndarray | jnp.ndarray, signs: np.ndarray, dim_pad: int) -> jnp.ndarray:
    """Pad to 2^m, apply random signs, then FWHT (the RHT used by
    RaBitQ/PolarVec, cf. rabitq_mmap.rs pad->signs->FWHT)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    pad = dim_pad - x.shape[-1]
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return fwht(x * jnp.asarray(signs))


def rotate_host(x: np.ndarray, signs: np.ndarray, dim_pad: int) -> np.ndarray:
    """Numpy twin of :func:`rotate` for BUILD-time encoding of large
    corpora: a million-row rotation is log2(D) vectorized passes on the
    host, while routing it through the device costs a full H2D+D2H of the
    corpus (hundreds of seconds through a tunnel) for no benefit."""
    x = np.asarray(x, dtype=np.float32)
    pad = dim_pad - x.shape[-1]
    if pad:
        x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    x = x * signs
    d = x.shape[-1]
    h = 1
    while h < d:
        x = x.reshape(x.shape[:-1] + (d // (2 * h), 2, h))
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = np.concatenate([a + b, a - b], axis=-1).reshape(x.shape[:-3] + (d,))
        h *= 2
    return x / np.sqrt(np.float32(d))


def _int8_dot(a_f32: jnp.ndarray, codes_i8_t: jnp.ndarray) -> jnp.ndarray:
    """f32 (B, D) x int8 (D, N) as a TRUE int8 MXU matmul.

    The query side is dynamically quantized per row (symmetric, 127
    levels) so both operands are int8 and the accumulation is int32 — on
    v5e this runs at 2x the bf16 MXU rate and reads the codes at 1
    byte/dim. The ~1/127 relative rounding on the query side is absorbed
    by the exact re-rank every caller performs on the shortlist."""
    amax = jnp.max(jnp.abs(a_f32), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q_i8 = jnp.clip(jnp.round(a_f32 / scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q_i8,
        codes_i8_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * scale


# ── SQ8 ──────────────────────────────────────────────────────────────────


class SQ8:
    """Per-dimension min/max scalar quantizer (quantizer/mod.rs:115).
    Codes are centered int8 (c = u8 - 128) so the MXU int8 path applies."""

    def __init__(self, lo: np.ndarray, hi: np.ndarray):
        self.lo = lo.astype(np.float32)
        self.scale = ((hi - lo) / 255.0).astype(np.float32)
        self.scale[self.scale == 0] = 1e-30

    @classmethod
    def fit(cls, data: np.ndarray) -> "SQ8":
        return cls(data.min(axis=0), data.max(axis=0))

    def encode(self, data: np.ndarray) -> np.ndarray:
        # chunked + in-place: the naive broadcast expression allocates six
        # full-corpus temps and np.round is the slow path — measured 33.7 s
        # at 1M x 128 on a 1-core host vs ~4 s chunked with np.rint
        inv = (1.0 / self.scale).astype(np.float32)
        neg_lo = (-self.lo).astype(np.float32)
        out = np.empty(data.shape, dtype=np.int8)
        for lo_i in range(0, data.shape[0], 131072):
            hi = min(lo_i + 131072, data.shape[0])
            u = (data[lo_i:hi] + neg_lo) * inv
            np.rint(u, out=u)
            np.clip(u, 0.0, 255.0, out=u)
            u -= 128.0
            out[lo_i:hi] = u.astype(np.int8)
        return out

    def decode(self, codes: np.ndarray) -> np.ndarray:
        return (codes.astype(np.float32) + 128.0) * self.scale + self.lo

    def row_sq_from_codes(self, codes: np.ndarray) -> np.ndarray:
        """||decode(c)||^2 without materializing the decode: decoded_d =
        a_d c_d + b_d, so the squared norm is (c^2)@a^2 + c@(2ab) + sum b^2
        — three thin matvecs instead of a full-corpus f64 decode (54.6 s ->
        ~2 s at 1M x 128)."""
        a = self.scale.astype(np.float64)
        b = (self.lo + 128.0 * self.scale).astype(np.float64)
        a2 = (a * a).astype(np.float32)
        ab2 = (2.0 * a * b).astype(np.float32)
        bb = np.float32((b * b).sum())
        out = np.empty(codes.shape[0], dtype=np.float32)
        for lo_i in range(0, codes.shape[0], 131072):
            hi = min(lo_i + 131072, codes.shape[0])
            cf = codes[lo_i:hi].astype(np.float32)
            out[lo_i:hi] = (cf * cf) @ a2 + cf @ ab2 + bb
        return out

    def to_arrays(self):
        return {"lo": self.lo, "scale": self.scale}


@partial(jax.jit, static_argnames=("metric_kind",))
def sq8_scores(
    q: jnp.ndarray,  # (B, D) f32
    codes: jnp.ndarray,  # (N, D) int8
    lo: jnp.ndarray,  # (D,)
    scale: jnp.ndarray,  # (D,)
    row_sq: jnp.ndarray,  # (N,) decoded squared norms
    metric_kind: str,  # "ip" | "l2" | "cosine"
):
    """Approximate scores against SQ8 codes. q.x_hat decomposes into
    q.(lo + 128*scale) + (q*scale).c — one int8 matmul."""
    base = q @ (lo + 128.0 * scale)  # (B,)
    ip = base[:, None] + _int8_dot(q * scale[None, :], codes.T)
    if metric_kind == "ip":
        return ip
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    if metric_kind == "l2":
        return jnp.maximum(q_sq + row_sq[None, :] - 2.0 * ip, 0.0)
    denom = jnp.sqrt(q_sq * row_sq[None, :])
    return jnp.where(denom < 1e-30, 1.0, 1.0 - ip / jnp.maximum(denom, 1e-30))


# ── RaBitQ (1-bit + RHT) ─────────────────────────────────────────────────


class RaBitQ:
    """1 bit/dim in the rotated domain: rot(x) ~ alpha * sign(rot(x)) with
    alpha = mean |rot(x)| per row (the L1-optimal 1-bit scale)."""

    def __init__(self, signs: np.ndarray, dim: int, dim_pad: int):
        self.signs = signs
        self.dim = dim
        self.dim_pad = dim_pad

    @classmethod
    def fit(cls, dim: int, seed: int = 1234) -> "RaBitQ":
        dim_pad = _next_pow2(dim)
        return cls(rotation_signs(dim_pad, seed), dim, dim_pad)

    def encode(self, data: np.ndarray) -> dict:
        n = data.shape[0]
        bits = np.empty((n, self.dim_pad), dtype=np.int8)
        alpha = np.empty(n, dtype=np.float32)
        row_sq = np.empty(n, dtype=np.float32)
        # chunked: full-corpus temps (7 FWHT passes + abs + sign) thrash a
        # 1-core host's cache — 50.5 s full vs ~15 s at 131072-row chunks
        for lo_i in range(0, n, 131072):
            hi = min(lo_i + 131072, n)
            blk = data[lo_i:hi]
            rot = rotate_host(blk, self.signs, self.dim_pad)
            alpha[lo_i:hi] = np.abs(rot).mean(axis=-1)
            bits[lo_i:hi] = np.where(rot > 0, 1, -1)
            row_sq[lo_i:hi] = np.einsum("ij,ij->i", blk, blk)
        return {"bits": bits, "alpha": alpha, "row_sq": row_sq}


@partial(jax.jit, static_argnames=("metric_kind",))
def rabitq_scores(q_rot, bits, alpha, row_sq, q_sq, metric_kind: str):
    """Estimated scores: <rot q, rot x> ~ alpha * <rot q, sgn>."""
    ip = alpha[None, :] * _int8_dot(q_rot, bits.T)
    if metric_kind == "ip":
        return ip
    if metric_kind == "l2":
        return jnp.maximum(q_sq[:, None] + row_sq[None, :] - 2.0 * ip, 0.0)
    denom = jnp.sqrt(q_sq[:, None] * row_sq[None, :])
    return jnp.where(denom < 1e-30, 1.0, 1.0 - ip / jnp.maximum(denom, 1e-30))


# ── PolarVec (training-free multi-bit + RHT) ────────────────────────────


class PolarVec:
    """Multi-bit (default 4) uniform quantization per row in the rotated
    domain: rot(x) ~ lo_r + c * s_r, c in [0, 2^bits)."""

    def __init__(self, signs: np.ndarray, dim: int, dim_pad: int, bits: int = 4):
        self.signs = signs
        self.dim = dim
        self.dim_pad = dim_pad
        self.bits = bits
        self.levels = (1 << bits) - 1

    @classmethod
    def fit(cls, dim: int, bits: int = 4, seed: int = 5678) -> "PolarVec":
        return cls(rotation_signs(_next_pow2(dim), seed), dim, _next_pow2(dim), bits)

    def encode(self, data: np.ndarray) -> dict:
        n = data.shape[0]
        codes = np.empty((n, self.dim_pad), dtype=np.int8)
        lo_all = np.empty(n, dtype=np.float32)
        scale_all = np.empty(n, dtype=np.float32)
        row_sq = np.empty(n, dtype=np.float32)
        for lo_i in range(0, n, 131072):
            hi_i = min(lo_i + 131072, n)
            blk = data[lo_i:hi_i]
            rot = rotate_host(blk, self.signs, self.dim_pad)
            lo = rot.min(axis=-1)
            hi = rot.max(axis=-1)
            scale = (hi - lo) / max(self.levels, 1)
            scale[scale == 0] = 1e-30
            rot -= lo[:, None]
            rot /= scale[:, None]
            np.rint(rot, out=rot)
            np.clip(rot, 0.0, float(self.levels), out=rot)
            codes[lo_i:hi_i] = rot.astype(np.int8)
            lo_all[lo_i:hi_i] = lo
            scale_all[lo_i:hi_i] = scale
            row_sq[lo_i:hi_i] = np.einsum("ij,ij->i", blk, blk)
        return {"codes": codes, "lo": lo_all, "scale": scale_all, "row_sq": row_sq}


@partial(jax.jit, static_argnames=("metric_kind",))
def polarvec_scores(q_rot, codes, lo, scale, row_sq, q_sq, metric_kind: str):
    qsum = jnp.sum(q_rot, axis=-1)  # (B,)
    ip = lo[None, :] * qsum[:, None] + scale[None, :] * _int8_dot(q_rot, codes.T)
    if metric_kind == "ip":
        return ip
    if metric_kind == "l2":
        return jnp.maximum(q_sq[:, None] + row_sq[None, :] - 2.0 * ip, 0.0)
    denom = jnp.sqrt(q_sq[:, None] * row_sq[None, :])
    return jnp.where(denom < 1e-30, 1.0, 1.0 - ip / jnp.maximum(denom, 1e-30))


# ── Product quantization ─────────────────────────────────────────────────


def parse_n_subspaces(dim: int, requested: int | None) -> int:
    """Pick a subspace count that divides the (padded) dim; default 16
    (pq_mmap.rs M=16)."""
    m = requested or 16
    m = min(m, dim)
    while dim % m != 0:
        m -= 1
    return max(m, 1)


class PQ:
    """Per-subspace 256-entry codebooks trained with the on-TPU k-means
    (quantizer/mod.rs:420 ProductQuantizer, pq_mmap.rs ADC scan)."""

    def __init__(self, codebooks: np.ndarray):
        self.codebooks = codebooks.astype(np.float32)  # (M, 256, Ds)
        self.m = codebooks.shape[0]
        self.ds = codebooks.shape[2]

    # codebooks train on a row sample: k-means quality saturates well below
    # full-corpus size for 256 centroids (the standard PQ practice), and the
    # full-1M fit dominated the 30 s reference build budget
    TRAIN_SAMPLE = 131_072

    @classmethod
    def fit(cls, data: np.ndarray, n_subspaces: int | None = None, seed: int = 42) -> "PQ":
        from .kmeans import train_kmeans

        n, dim = data.shape
        m = parse_n_subspaces(dim, n_subspaces)
        ds = dim // m
        k = min(256, max(2, n))
        if n > cls.TRAIN_SAMPLE:
            sel = np.random.default_rng(seed).choice(n, cls.TRAIN_SAMPLE, replace=False)
            sel.sort()
            data = data[sel]
        books = np.zeros((m, 256, ds), dtype=np.float32)
        for s in range(m):
            sub = np.ascontiguousarray(data[:, s * ds : (s + 1) * ds])
            cents, _ = train_kmeans(sub, k, seed=seed + s, max_iters=15)
            books[s, : cents.shape[0]] = cents
            if cents.shape[0] < 256:
                books[s, cents.shape[0] :] = cents[0]
        return cls(books)

    def encode(self, data: np.ndarray) -> np.ndarray:
        n, dim = data.shape
        codes = np.empty((n, self.m), dtype=np.uint8)
        cb = jnp.asarray(self.codebooks)
        # all M subspaces assign in ONE dispatch per row chunk (a per-subspace
        # loop paid M dispatches + M small fetches per chunk — 256 tunnel
        # round trips at 1M); chunk bounds the (M, C, 256) score block
        chunk = 32768
        for lo_i in range(0, n, chunk):
            hi_i = min(lo_i + chunk, n)
            blk = data[lo_i:hi_i].reshape(hi_i - lo_i, self.m, self.ds).transpose(1, 0, 2)
            if hi_i - lo_i < chunk and n > chunk:
                # pad the tail chunk so every dispatch reuses one executable
                blk = np.concatenate(
                    [blk, np.zeros((self.m, chunk - (hi_i - lo_i), self.ds), np.float32)],
                    axis=1)
            blk = np.ascontiguousarray(blk)
            codes[lo_i:hi_i] = np.asarray(_pq_assign_all(jnp.asarray(blk), cb)).T[: hi_i - lo_i]
        return codes

    def row_sq_norm_table(self) -> np.ndarray:
        """(M, 256) per-subspace centroid squared norms: reconstructed row
        norms are a gather-sum over this (subvectors are disjoint, so no
        cross terms) — replaces the full-corpus decode."""
        return np.einsum("mks,mks->mk", self.codebooks, self.codebooks).astype(np.float32)

    def row_sq_from_codes(self, codes: np.ndarray) -> np.ndarray:
        tab = self.row_sq_norm_table()
        out = np.zeros(codes.shape[0], dtype=np.float32)
        for s in range(self.m):
            out += tab[s, codes[:, s]]
        return out

    def decode(self, codes: np.ndarray) -> np.ndarray:
        n = codes.shape[0]
        out = np.zeros((n, self.m * self.ds), dtype=np.float32)
        for s in range(self.m):
            out[:, s * self.ds : (s + 1) * self.ds] = self.codebooks[s][codes[:, s]]
        return out


@jax.jit
def _pq_assign_all(sub_blocks: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """Nearest-centroid codes for every subspace at once: (M, C, Ds) rows vs
    (M, 256, Ds) codebooks -> (M, C) uint8 via one batched matmul."""
    x2 = jnp.sum(sub_blocks * sub_blocks, axis=-1, keepdims=True)  # (M,C,1)
    c2 = jnp.sum(codebooks * codebooks, axis=-1)  # (M,256)
    ip = jnp.einsum("mcd,mkd->mck", sub_blocks, codebooks,
                    preferred_element_type=jnp.float32)
    d = x2 - 2.0 * ip + c2[:, None, :]
    return jnp.argmin(d, axis=-1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("metric_kind",))
def pq_scores(
    q: jnp.ndarray,  # (B, D) f32 (D = M*Ds)
    codes: jnp.ndarray,  # (N, M) uint8
    codebooks: jnp.ndarray,  # (M, 256, Ds)
    row_sq: jnp.ndarray,  # (N,) reconstructed squared norms
    metric_kind: str,
):
    """ADC scan as MXU work: build the (M, 256) LUT of per-subspace partial
    IPs with one batched matmul, then evaluate the lookups as a NIBBLE
    BILINEAR FORM instead of a gather — with c = 16*hi + lo,

        LUT[m, c] = onehot(hi) @ LUT[m].reshape(16, 16) @ onehot(lo)

    so the whole per-row gather-sum becomes two batched (N,16)x(16,16)
    matmuls per subspace. TPU has no vector gather (take_along_axis lowers
    to a serial dynamic-slice loop — measured ~140 ms per 1M x 16 query on
    v5e, the whole r04 PQ latency); the bilinear form streams at matmul
    bandwidth. The nibble one-hots are code-only (query-independent), so a
    batch reuses them across queries."""
    b, d = q.shape
    m, k, ds = codebooks.shape
    q_sub = q.reshape(b, m, ds)
    # LUT[b, m, k] = <q_sub[b,m], codebook[m,k]>
    lut = jnp.einsum("bms,mks->bmk", q_sub, codebooks, preferred_element_type=jnp.float32)
    # bf16 one-hots halve the HBM traffic on TPU; the CPU thunk runtime has
    # no bf16xbf16 dot (UNIMPLEMENTED DotThunk), so tests ride f32
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    t = lut.reshape(b, m, 16, 16).astype(dt)
    eye = jnp.arange(16, dtype=jnp.int32)
    hi_oh = ((codes >> 4).astype(jnp.int32)[:, :, None] == eye).astype(dt)
    lo_oh = ((codes & 15).astype(jnp.int32)[:, :, None] == eye).astype(dt)

    def per_query(t_q):  # (M, 16, 16)
        p = jnp.einsum("nma,mab->nmb", hi_oh, t_q,
                       preferred_element_type=jnp.float32)  # (N, M, 16)
        return jnp.einsum("nmb,nmb->n", p, lo_oh.astype(jnp.float32))

    ip = jax.lax.map(per_query, t)
    if metric_kind == "ip":
        return ip
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    if metric_kind == "l2":
        return jnp.maximum(q_sq + row_sq[None, :] - 2.0 * ip, 0.0)
    denom = jnp.sqrt(q_sq * row_sq[None, :])
    return jnp.where(denom < 1e-30, 1.0, 1.0 - ip / jnp.maximum(denom, 1e-30))
