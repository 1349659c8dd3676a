"""Pure-numpy (f64) reference implementations of the 16 metric contracts,
used to validate the TPU kernels. These re-derive the documented semantics
(reference: src/distance/simd.rs) independently in numpy."""

import numpy as np


def ip(a, b):
    return float(np.dot(a.astype(np.float64), b.astype(np.float64)))


def l2(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    return float(np.dot(d, d))


def cosine(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    denom = np.sqrt(np.dot(a, a) * np.dot(b, b))
    if denom < 1e-30:
        return 1.0
    return float(1.0 - np.dot(a, b) / denom)


def hamming(a, b):
    return float(np.sum((a > 0.5) != (b > 0.5)))


def jaccard(a, b):
    ab = a > 0.5
    bb = b > 0.5
    union = np.sum(ab | bb)
    if union == 0:
        return 0.0
    return float(1.0 - np.sum(ab & bb) / union)


def dice(a, b):
    ab = a > 0.5
    bb = b > 0.5
    total = np.sum(ab) + np.sum(bb)
    if total == 0:
        return 0.0
    return float(1.0 - 2.0 * np.sum(ab & bb) / total)


def l1(a, b):
    return float(np.sum(np.abs(a.astype(np.float64) - b.astype(np.float64))))


def chebyshev(a, b):
    return float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64))))


def canberra(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    denom = np.abs(a) + np.abs(b)
    term = np.where(denom == 0.0, 0.0, np.abs(a - b) / np.where(denom == 0, 1, denom))
    return float(np.sum(term))


def bray_curtis(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    num = np.sum(np.abs(a - b))
    den = np.sum(np.abs(a + b))
    if den == 0.0:
        return 0.0 if num == 0.0 else np.inf
    return float(num / den)


def haversine(a, b):
    if len(a) != 2 or len(b) != 2:
        return np.inf
    radius = 6_371_008.8
    lon1, lat1 = np.radians(a.astype(np.float64))
    lon2, lat2 = np.radians(b.astype(np.float64))
    if not np.isfinite([lon1, lat1, lon2, lat2]).all() or abs(a[1]) > 90 or abs(b[1]) > 90:
        return np.inf
    sl = np.sin((lat2 - lat1) / 2)
    so = np.sin((lon2 - lon1) / 2)
    h = np.clip(sl * sl + np.cos(lat1) * np.cos(lat2) * so * so, 0.0, 1.0)
    return float(2 * radius * np.arcsin(np.sqrt(h)))


def correlation(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    n = len(a)
    if n == 0:
        return 0.0
    var_a = max(np.sum(a * a) - np.sum(a) ** 2 / n, 0.0)
    var_b = max(np.sum(b * b) - np.sum(b) ** 2 / n, 0.0)
    denom = np.sqrt(var_a * var_b)
    if denom <= np.finfo(np.float64).eps:
        return 0.0 if np.array_equal(a, b) else 1.0
    cov = np.sum(a * b) - np.sum(a) * np.sum(b) / n
    return float(1.0 - np.clip(cov / denom, -1.0, 1.0))


def hellinger(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if np.any(~np.isfinite(a)) or np.any(~np.isfinite(b)) or np.any(a < 0) or np.any(b < 0):
        return np.inf
    sa, sb = np.sum(a), np.sum(b)
    if sa == 0.0 or sb == 0.0:
        return 0.0 if sa == sb else 1.0
    coeff = np.sum(np.sqrt(a * b)) / np.sqrt(sa * sb)
    return float(np.sqrt(1.0 - np.clip(coeff, 0.0, 1.0)))


def wasserstein(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if np.any(~np.isfinite(a)) or np.any(~np.isfinite(b)) or np.any(a < 0) or np.any(b < 0):
        return np.inf
    sa, sb = np.sum(a), np.sum(b)
    if sa == 0.0 or sb == 0.0:
        return 0.0 if sa == sb else np.inf
    cdf = np.cumsum(a / sa - b / sb)[:-1]
    return float(np.sum(np.abs(cdf)))


def jensen_shannon(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if np.any(~np.isfinite(a)) or np.any(~np.isfinite(b)) or np.any(a < 0) or np.any(b < 0):
        return np.inf
    sa, sb = np.sum(a), np.sum(b)
    if sa == 0.0 or sb == 0.0:
        return 0.0 if sa == sb else float(np.sqrt(np.log(2)))
    p = a / sa
    q = b / sb
    m = 0.5 * (p + q)
    div = 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        div += 0.5 * np.sum(np.where(p > 0, p * np.log(np.where(p > 0, p / m, 1)), 0.0))
        div += 0.5 * np.sum(np.where(q > 0, q * np.log(np.where(q > 0, q / m, 1)), 0.0))
    return float(np.sqrt(max(div, 0.0)))


FNS = {
    "ip": ip,
    "l2": l2,
    "cosine": cosine,
    "hamming": hamming,
    "jaccard": jaccard,
    "tanimoto": jaccard,
    "dice": dice,
    "l1": l1,
    "chebyshev": chebyshev,
    "canberra": canberra,
    "bray_curtis": bray_curtis,
    "haversine": haversine,
    "correlation": correlation,
    "hellinger": hellinger,
    "wasserstein": wasserstein,
    "jensen_shannon": jensen_shannon,
}
