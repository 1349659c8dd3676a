"""Bisect the shortlist-selection epilogue cost of the bf16 first pass.

Round-4 device data: the production formulation (x16.T contraction +
masked_top_c) runs ~23.4 ms/scan at BOTH 131k and 1M rows (B=256) — a
fixed selection cost, not HBM bandwidth — while the same contraction with
a bare ``jax.lax.approx_max_k`` measured 1.85 ms at 1M
(benchmarks/xla_scan_variants_r04.log, prodT). This script isolates which
epilogue ingredient pays the 13x: the recall_target, the mask/nan wheres,
or aggregate_to_topk.

Usage: python scripts/topc_epilogue_variants.py [N] [B] [ITERS]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
D = 128
C = 64


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    n_pad = ((N + 8191) // 8192) * 8192
    x = rng.normal(size=(n_pad, D)).astype(np.float32)
    x16 = jax.device_put(jnp.asarray(x).astype(jnp.bfloat16))
    xm = jax.device_put(jnp.asarray(rng.normal(size=(n_pad,)).astype(np.float32)))
    valid = jax.device_put(jnp.ones(n_pad, dtype=bool))
    x16.block_until_ready()

    neg = np.float32(-np.inf)

    def scores(q16, xarr, xmv):
        return jax.lax.dot_general(
            q16, xarr.T, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + xmv[None, :]

    def sel_raw95(s, v):
        return jax.lax.approx_max_k(s, C)[0]

    def sel_raw99(s, v):
        return jax.lax.approx_max_k(s, C, recall_target=0.99)[0]

    def sel_noagg99(s, v):
        return jax.lax.approx_max_k(
            s, C, recall_target=0.99, aggregate_to_topk=False)[0][:, :C]

    def sel_mask95(s, v):
        s = jnp.where(jnp.isnan(s), neg, s)
        s = jnp.where(v[None, :], s, neg)
        return jax.lax.approx_max_k(s, C)[0]

    def sel_mask99(s, v):  # == production masked_top_c (IP orientation)
        s = jnp.where(jnp.isnan(s), neg, s)
        s = jnp.where(v[None, :], s, neg)
        return jax.lax.approx_max_k(s, C, recall_target=0.99)[0]

    variants = {
        "raw95": sel_raw95,
        "raw99": sel_raw99,
        "noagg99": sel_noagg99,
        "mask95": sel_mask95,
        "mask99": sel_mask99,
    }
    order = os.environ.get("TOPC_ORDER")
    if order:
        names = [t.strip() for t in order.split(",") if t.strip()]
        unknown = [n for n in names if n not in variants]
        if unknown:
            raise SystemExit(f"unknown TOPC_ORDER variants: {unknown}")
        variants = {n: variants[n] for n in names}

    def make_loop(sel):
        def step(it, carry):
            q, xarr, xmv, v, acc = carry
            qi = q + (it.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            out = sel(scores(qi, xarr, xmv), v)
            return (q, xarr, xmv, v, acc + out[:, :4].astype(jnp.float32))

        @jax.jit
        def run(q, xarr, xmv, v):
            q16 = q.astype(jnp.bfloat16)
            *_, acc = jax.lax.fori_loop(
                0, ITERS, step,
                (q16, xarr, xmv, v, jnp.zeros((q.shape[0], 4), jnp.float32)))
            return acc

        return run

    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    for name, sel in variants.items():
        run = make_loop(sel)
        t0 = time.perf_counter()
        np.asarray(run(q, x16, xm, valid))
        compile_s = time.perf_counter() - t0
        for rep in range(3):
            t0 = time.perf_counter()
            np.asarray(run(q + np.float32(1.0 + rep), x16, xm, valid))
            wall = time.perf_counter() - t0
            bw = n_pad * D * 2 * ITERS / wall / 1e9
            print(f"B={B} {name:8s} rep{rep}: {wall / ITERS * 1e3:8.3f} ms/scan "
                  f"(corpus bw {bw:7.1f} GB/s, compile+1st {compile_s:.1f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
