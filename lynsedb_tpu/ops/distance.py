"""Pairwise distance computation for all 16 metrics, TPU-first.

Design: each metric is factored into
  * ``corpus_transform(x)``  — a one-time per-row preprocessing pass over the
    corpus (norms, centering, sqrt/cumsum/probability transforms, binarize).
    Every leaf of the returned pytree has leading dim N so the scan driver can
    chunk it uniformly.
  * ``query_transform(q)``   — the same for a query batch.
  * ``pairwise(qt, ct)``     — the hot pairwise form. For the MXU-friendly
    metrics (IP/L2/Cosine/Correlation/Hellinger and the thresholded binary
    family) this is a single matmul plus rank-1 corrections; the remaining
    metrics run on elementwise VPU lanes over (B, C, D) tiles.

Semantics match the reference contract (reference: src/distance/simd.rs —
cosine zero-norm policy :154, Hamming/Jaccard 0.5 thresholding :175/:190,
Jensen-Shannon normalization :235, Haversine IUGG radius + validity :604,
correlation constant-row policy :633, Hellinger :666, Wasserstein-1D :689,
Dice :718, Canberra 0/0 policy :561, Bray-Curtis :582) — computed in f32 on
TPU rather than f64 on CPU.

All distances are returned as f32 "scores" in the metric's native orientation
(callers use ``Metric.ascending`` to order them).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import Metric

# host-side scalar, NOT jnp: a module-level jax.Array is created on the
# default device at import and later embedded as an MLIR constant, which
# forces a device->host fetch DURING LOWERING — through the TPU tunnel
# that fetch queues behind bulk staging transfers and stalls cold-start
# compiles for minutes (measured 238-340 s first-search; faulthandler
# trace: ir_constant -> _array_mlir_constant_handler -> array._value)
INF = np.float32(np.inf)
_SQRT_LN2 = math.sqrt(math.log(2.0))


def _dot(a, b_t):
    """MXU matmul with f32 accumulation. ``b_t`` is (D, C).

    ``Precision.HIGHEST`` keeps full f32 fidelity on the MXU (TPU f32 matmul
    otherwise truncates inputs to bf16, which breaks exact-recall parity with
    the reference's f32 SIMD scans). Binary metrics bypass this — {0,1}
    values are exact in bf16 with f32 accumulation.
    """
    return jax.lax.dot_general(
        a,
        b_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _row_invalid_nonneg(x):
    """Rows containing non-finite or negative entries (probability-domain
    metrics return +inf for these)."""
    return jnp.any(~jnp.isfinite(x) | (x < 0.0), axis=-1)


# ── corpus / query transforms ────────────────────────────────────────────


def corpus_transform(x: jnp.ndarray, metric: Metric) -> dict:
    """Per-row preprocessing of a corpus block ``x`` (N, D) f32.

    Returns a dict pytree whose every leaf has leading dimension N.
    """
    x = x.astype(jnp.float32)
    if metric is Metric.IP:
        return {"x": x}
    if metric is Metric.L2:
        return {"x": x, "sq": jnp.sum(x * x, axis=-1)}
    if metric is Metric.COSINE:
        return {"x": x, "sq": jnp.sum(x * x, axis=-1)}
    if metric is Metric.CORRELATION:
        mean = jnp.mean(x, axis=-1)
        xc = x - mean[:, None]
        var = jnp.sum(xc * xc, axis=-1)
        return {"xc": xc, "var": var, "mean": mean}
    if metric is Metric.HELLINGER:
        invalid = _row_invalid_nonneg(x)
        safe = jnp.where(invalid[:, None], 0.0, x)
        mass = jnp.sum(safe, axis=-1)
        return {"s": jnp.sqrt(safe), "mass": mass, "invalid": invalid}
    if metric in (Metric.HAMMING, Metric.JACCARD, Metric.DICE, Metric.TANIMOTO):
        # Thresholded one-bit rows; {0,1} values are exact in bf16 and the
        # matmul accumulates in f32, so popcounts are exact.
        b = (x > 0.5).astype(jnp.bfloat16)
        return {"b": b, "cnt": jnp.sum(b.astype(jnp.float32), axis=-1)}
    if metric is Metric.WASSERSTEIN:
        invalid = _row_invalid_nonneg(x)
        safe = jnp.where(invalid[:, None], 0.0, x)
        mass = jnp.sum(safe, axis=-1)
        inv = jnp.where(mass > 0.0, 1.0 / mass, 0.0)
        cdf = jnp.cumsum(safe * inv[:, None], axis=-1)[:, :-1]
        return {"cdf": cdf, "mass": mass, "invalid": invalid}
    if metric is Metric.JENSEN_SHANNON:
        invalid = _row_invalid_nonneg(x)
        safe = jnp.where(invalid[:, None], 0.0, x)
        mass = jnp.sum(safe, axis=-1)
        inv = jnp.where(mass > 0.0, 1.0 / mass, 0.0)
        p = safe * inv[:, None]
        ent = jnp.sum(jnp.where(p > 0.0, p * jnp.log(jnp.where(p > 0.0, p, 1.0)), 0.0), axis=-1)
        return {"p": p, "ent": ent, "mass": mass, "invalid": invalid}
    # Pure elementwise metrics keep the raw rows.
    return {"x": x}


def query_transform(q: jnp.ndarray, metric: Metric) -> dict:
    """Same preprocessing for a query batch ``q`` (B, D) f32."""
    return corpus_transform(q, metric)


# ── pairwise scoring ─────────────────────────────────────────────────────


def pairwise(qt: dict, ct: dict, metric: Metric) -> jnp.ndarray:
    """Score a query batch against a corpus block: (B, C) f32."""
    fn = _PAIRWISE[metric]
    return fn(qt, ct)


def _pw_ip(qt, ct):
    return _dot(qt["x"], ct["x"].T)


def _pw_l2(qt, ct):
    ip = _dot(qt["x"], ct["x"].T)
    d = qt["sq"][:, None] + ct["sq"][None, :] - 2.0 * ip
    return jnp.maximum(d, 0.0)


def _pw_cosine(qt, ct):
    ip = _dot(qt["x"], ct["x"].T)
    denom = jnp.sqrt(qt["sq"][:, None] * ct["sq"][None, :])
    # reference policy: denom < 1e-30 -> distance 1.0 (simd.rs:1318-1339)
    return jnp.where(denom < 1e-30, 1.0, 1.0 - ip / jnp.maximum(denom, 1e-30))


def _pw_correlation(qt, ct):
    cov = _dot(qt["xc"], ct["xc"].T)
    var_q = qt["var"][:, None]
    var_x = ct["var"][None, :]
    denom = jnp.sqrt(var_q * var_x)
    const_pair = (var_q <= 1e-12) | (var_x <= 1e-12)
    # constant-row policy (simd.rs:633-664): two identical constant rows -> 0,
    # otherwise 1. Constant rows are equal iff their means are equal.
    both_const = (var_q <= 1e-12) & (var_x <= 1e-12)
    mean_eq = qt["mean"][:, None] == ct["mean"][None, :]
    r = jnp.clip(cov / jnp.maximum(denom, 1e-30), -1.0, 1.0)
    return jnp.where(const_pair, jnp.where(both_const & mean_eq, 0.0, 1.0), 1.0 - r)


def _pw_hellinger(qt, ct):
    bc_raw = _dot(qt["s"], ct["s"].T)
    mass_q = qt["mass"][:, None]
    mass_x = ct["mass"][None, :]
    denom = jnp.sqrt(mass_q * mass_x)
    bc = jnp.clip(bc_raw / jnp.maximum(denom, 1e-30), 0.0, 1.0)
    d = jnp.sqrt(1.0 - bc)
    zero_q = mass_q == 0.0
    zero_x = mass_x == 0.0
    d = jnp.where(zero_q | zero_x, jnp.where(zero_q & zero_x, 0.0, 1.0), d)
    invalid = qt["invalid"][:, None] | ct["invalid"][None, :]
    return jnp.where(invalid, INF, d)


def _binary_parts(qt, ct):
    inter = _dot(qt["b"].astype(jnp.bfloat16), ct["b"].T.astype(jnp.bfloat16))
    return inter, qt["cnt"][:, None], ct["cnt"][None, :]


def _pw_hamming(qt, ct):
    inter, cq, cx = _binary_parts(qt, ct)
    return cq + cx - 2.0 * inter


def _pw_jaccard(qt, ct):
    inter, cq, cx = _binary_parts(qt, ct)
    union = cq + cx - inter
    return jnp.where(union == 0.0, 0.0, 1.0 - inter / jnp.maximum(union, 1.0))


def _pw_dice(qt, ct):
    inter, cq, cx = _binary_parts(qt, ct)
    total = cq + cx
    return jnp.where(total == 0.0, 0.0, 1.0 - 2.0 * inter / jnp.maximum(total, 1.0))


def _pw_l1(qt, ct):
    return jnp.sum(jnp.abs(qt["x"][:, None, :] - ct["x"][None, :, :]), axis=-1)


def _pw_chebyshev(qt, ct):
    return jnp.max(jnp.abs(qt["x"][:, None, :] - ct["x"][None, :, :]), axis=-1)


def _pw_canberra(qt, ct):
    a = qt["x"][:, None, :]
    b = ct["x"][None, :, :]
    denom = jnp.abs(a) + jnp.abs(b)
    term = jnp.where(denom == 0.0, 0.0, jnp.abs(a - b) / jnp.maximum(denom, 1e-45))
    return jnp.sum(term, axis=-1)


def _pw_bray_curtis(qt, ct):
    a = qt["x"][:, None, :]
    b = ct["x"][None, :, :]
    num = jnp.sum(jnp.abs(a - b), axis=-1)
    den = jnp.sum(jnp.abs(a + b), axis=-1)
    return jnp.where(den == 0.0, jnp.where(num == 0.0, 0.0, INF), num / jnp.maximum(den, 1e-45))


def _pw_haversine(qt, ct):
    # [longitude_deg, latitude_deg] rows; IUGG mean Earth radius in meters
    # (simd.rs:604-631). Invalid rows (non-finite or |lat| > 90) -> +inf.
    r = jnp.float32(6_371_008.8)
    deg2rad = jnp.float32(math.pi / 180.0)
    q = qt["x"]
    x = ct["x"]
    lon1 = q[:, 0:1] * deg2rad
    lat1 = q[:, 1:2] * deg2rad
    lon2 = x[None, :, 0] * deg2rad
    lat2 = x[None, :, 1] * deg2rad
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    sin_lat = jnp.sin(dlat * 0.5)
    sin_lon = jnp.sin(dlon * 0.5)
    h = jnp.clip(sin_lat * sin_lat + jnp.cos(lat1) * jnp.cos(lat2) * sin_lon * sin_lon, 0.0, 1.0)
    d = 2.0 * r * jnp.arcsin(jnp.sqrt(h))
    bad_q = jnp.any(~jnp.isfinite(q), axis=-1) | (jnp.abs(q[:, 1]) > 90.0)
    bad_x = jnp.any(~jnp.isfinite(x), axis=-1) | (jnp.abs(x[:, 1]) > 90.0)
    return jnp.where(bad_q[:, None] | bad_x[None, :], INF, d)


def _pw_wasserstein(qt, ct):
    d = jnp.sum(jnp.abs(qt["cdf"][:, None, :] - ct["cdf"][None, :, :]), axis=-1)
    zero_q = qt["mass"][:, None] == 0.0
    zero_x = ct["mass"][None, :] == 0.0
    d = jnp.where(zero_q | zero_x, jnp.where(zero_q & zero_x, 0.0, INF), d)
    invalid = qt["invalid"][:, None] | ct["invalid"][None, :]
    return jnp.where(invalid, INF, d)


def _pw_jensen_shannon(qt, ct):
    p = qt["p"][:, None, :]
    q = ct["p"][None, :, :]
    m = p + q
    mix = jnp.sum(jnp.where(m > 0.0, m * jnp.log(jnp.where(m > 0.0, m, 1.0)), 0.0), axis=-1)
    div = jnp.float32(math.log(2.0)) + 0.5 * (qt["ent"][:, None] + ct["ent"][None, :] - mix)
    d = jnp.sqrt(jnp.maximum(div, 0.0))
    zero_q = qt["mass"][:, None] == 0.0
    zero_x = ct["mass"][None, :] == 0.0
    d = jnp.where(zero_q | zero_x, jnp.where(zero_q & zero_x, 0.0, jnp.float32(_SQRT_LN2)), d)
    invalid = qt["invalid"][:, None] | ct["invalid"][None, :]
    return jnp.where(invalid, INF, d)


_PAIRWISE = {
    Metric.IP: _pw_ip,
    Metric.L2: _pw_l2,
    Metric.COSINE: _pw_cosine,
    Metric.CORRELATION: _pw_correlation,
    Metric.HELLINGER: _pw_hellinger,
    Metric.HAMMING: _pw_hamming,
    Metric.JACCARD: _pw_jaccard,
    Metric.TANIMOTO: _pw_jaccard,  # reference maps Tanimoto to Jaccard (mod.rs:212)
    Metric.DICE: _pw_dice,
    Metric.L1: _pw_l1,
    Metric.CHEBYSHEV: _pw_chebyshev,
    Metric.CANBERRA: _pw_canberra,
    Metric.BRAY_CURTIS: _pw_bray_curtis,
    Metric.HAVERSINE: _pw_haversine,
    Metric.WASSERSTEIN: _pw_wasserstein,
    Metric.JENSEN_SHANNON: _pw_jensen_shannon,
}


@partial(jax.jit, static_argnames=("metric",))
def pairwise_distances(q: jnp.ndarray, x: jnp.ndarray, metric: Metric) -> jnp.ndarray:
    """Convenience one-shot (B, N) distance matrix (used by small paths and
    tests; the scan driver in :mod:`lynsedb_tpu.ops.scan` chunks instead)."""
    return pairwise(query_transform(q, metric), corpus_transform(x, metric), metric)


def compute_distance(a, b, metric: Metric | str) -> float:
    """Single-pair distance, mirroring ``lynse._core.compute_distance``
    (reference: src/python/mod.rs)."""
    import numpy as np

    if isinstance(metric, str):
        m = Metric.parse(metric)
        if m is None:
            raise ValueError(f"unknown metric: {metric}")
        metric = m
    a = jnp.asarray(np.asarray(a, dtype=np.float32).reshape(1, -1))
    b = jnp.asarray(np.asarray(b, dtype=np.float32).reshape(1, -1))
    return float(pairwise_distances(a, b, metric)[0, 0])
