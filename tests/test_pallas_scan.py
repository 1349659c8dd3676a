"""Pallas fused scan+top-C kernel — interpret-mode equivalence gates.

Perf validation is deferred to directly-attached TPU hardware (the dev
tunnel cannot time sub-ms kernels); correctness is gated here on CPU via
``interpret=True`` against the exact numpy ranking and against the XLA
two-pass kernel's selections. Both paths consume the MEAN-CENTERED bf16
layout (ops/scan.py _bf16_scores).
"""

import numpy as np
import pytest
import jax.numpy as jnp
import ml_dtypes

from lynsedb_tpu.metrics import Metric
from lynsedb_tpu.ops.pallas_scan import TILE_N, first_pass_topc


def _setup(rng, n=2 * TILE_N, d=64, b=4):
    """Mimic DeviceCorpus staging: centered bf16 rows + aux arrays."""
    x = rng.normal(size=(n, d)).astype(np.float32)
    mean = x.mean(axis=0)
    xc16 = (x - mean).astype(ml_dtypes.bfloat16)
    xc32 = xc16.astype(np.float32)
    aux = {
        "mean": jnp.asarray(mean),
        "xm": jnp.asarray(xc32 @ mean),
        "xc_sq": jnp.asarray((xc32**2).sum(axis=1)),
        "xsq_true": jnp.asarray((x**2).sum(axis=1)),
    }
    q = rng.normal(size=(b, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    # the effective rows the proxy sees: centered bf16 + exact mean
    xeff = xc32 + mean[None, :]
    return q, xc16, aux, valid, x, xeff


@pytest.mark.parametrize("metric", [Metric.IP, Metric.L2, Metric.COSINE])
def test_pallas_matches_exact_ranking(rng, metric):
    q, xc16, aux, valid, x, xeff = _setup(rng)
    c = 64
    d_out, i_out = first_pass_topc(
        jnp.asarray(q), jnp.asarray(xc16), aux, jnp.asarray(valid),
        metric=metric, c=c, ascending=metric.ascending, interpret=True,
    )
    i_out = np.asarray(i_out)
    if metric is Metric.IP:
        scores = q @ xeff.T
    elif metric is Metric.L2:
        scores = ((q[:, None] - xeff[None]) ** 2).sum(-1)
    else:
        # cosine proxy: true numerator on effective rows, TRUE row norms
        num = q @ xeff.T
        denom = np.linalg.norm(q, axis=1, keepdims=True) * np.sqrt((x**2).sum(1))[None, :]
        scores = 1.0 - num / np.maximum(denom, 1e-30)
    keyed = -scores if metric.ascending else scores
    want = np.argsort(-keyed, axis=1, kind="stable")[:, :c]
    for row in range(q.shape[0]):
        got, exp = set(i_out[row].tolist()), set(want[row].tolist())
        # bf16 rounding can swap candidates at the shortlist boundary;
        # demand >= 60/64 agreement and top-8 within the reference top-12
        assert len(got & exp) >= c - 4
        assert len(set(i_out[row, :8].tolist()) & set(want[row, :12].tolist())) >= 7
    # proxy values: IP values shift by the constant q.mean (rank-neutral)
    d_np = np.asarray(d_out)
    for row in range(q.shape[0]):
        ref = scores[row, i_out[row]]
        if metric is Metric.IP:
            ref = ref - float(q[row] @ np.asarray(aux["mean"]))
        np.testing.assert_allclose(d_np[row], ref, rtol=2e-2, atol=2e-3)


def test_pallas_respects_valid_mask(rng):
    q, xc16, aux, valid, _, _ = _setup(rng, b=2)
    valid[:] = False
    valid[5] = valid[TILE_N + 7] = True
    d_out, i_out = first_pass_topc(
        jnp.asarray(q), jnp.asarray(xc16), aux, jnp.asarray(valid),
        metric=Metric.IP, c=16, ascending=False, interpret=True,
    )
    i_out = np.asarray(i_out)
    d_np = np.asarray(d_out)
    live = d_np > -np.inf
    assert live.sum(axis=1).tolist() == [2, 2]
    assert set(i_out[0][live[0]].tolist()) == {5, TILE_N + 7}


def test_pallas_matches_xla_two_pass_selection(rng):
    """Same shortlist behavior as the XLA first pass feeding the exact
    rescore: after rescoring, both paths must produce the same top-10."""
    from lynsedb_tpu.ops.scan import bf16_pass_ids

    q, xc16, aux, valid, x, _ = _setup(rng, b=3)
    c = 64
    d_p, i_p = first_pass_topc(
        jnp.asarray(q), jnp.asarray(xc16), aux, jnp.asarray(valid),
        metric=Metric.IP, c=c, ascending=False, interpret=True,
    )
    i_x = np.asarray(bf16_pass_ids(
        jnp.asarray(q), jnp.asarray(xc16), aux, jnp.asarray(valid),
        metric=Metric.IP, k=c, ascending=False,
    )).astype(np.int64)
    exact = q @ x.T
    for row in range(3):
        top_p = np.asarray(i_p)[row][np.argsort(-exact[row, np.asarray(i_p)[row]])[:10]]
        top_x = i_x[row][np.argsort(-exact[row, i_x[row]])[:10]]
        assert top_p.tolist() == top_x.tolist()
