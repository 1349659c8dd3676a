"""Device-side A/B of the Pallas fused scan+top-C kernel vs the XLA path.

Same methodology as scripts/tpu_probe.py: ITERS iterations inside one jitted
fori_loop with loop-varying queries, timing a single fetch, so the dev
tunnel's per-dispatch cost amortizes to ~0.

Usage: python scripts/pallas_probe.py [N] [B] [ITERS]
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

    from lynsedb_tpu.metrics import Metric
    from lynsedb_tpu.ops.pallas_scan import TILE_N, first_pass_topc
    from lynsedb_tpu.ops.topk import masked_top_c

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    n_pad = ((N + TILE_N - 1) // TILE_N) * TILE_N
    x = rng.normal(size=(n_pad, D)).astype(np.float32)
    mean = x.mean(axis=0)
    xc = x - mean[None, :]
    x16 = jax.device_put(jnp.asarray(xc).astype(jnp.bfloat16))
    # reproduce the bf16 round-trip host-side (ops/scan._convert_block does
    # the same) instead of pulling ~N*D*2 bytes back through the tunnel
    import ml_dtypes
    xc32 = xc.astype(ml_dtypes.bfloat16).astype(np.float32)
    aux = {
        "mean": jnp.asarray(mean),
        "xm": jnp.asarray(xc32 @ mean),
        "xc_sq": jnp.asarray((xc32 ** 2).sum(axis=1)),
        "xsq_true": jnp.asarray((x ** 2).sum(axis=1)),
    }
    valid = jnp.ones(n_pad, dtype=bool)
    x16.block_until_ready()

    def xla_pass(q, xarr, auxt, validt):
        # the production ops/scan.py formulation: contract via x16.T,
        # masked_top_c selection (same epilogue as bf16_pass_ids)
        qc = (q - auxt["mean"][None, :]).astype(jnp.bfloat16)
        ip = jax.lax.dot_general(
            qc, xarr.T, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + auxt["xm"][None, :]
        d, i = masked_top_c(ip, C, False, validt)
        return d

    # call the unjitted body inside the fori_loop: the nested-jit
    # closed_call lowering crashes (KeyError in mlir lowering cache) when a
    # jitted pallas_call wrapper is invoked from a loop body on this JAX
    _first_pass_raw = getattr(first_pass_topc, "__wrapped__", first_pass_topc)

    def pallas_pass(q, xarr, auxt, validt):
        d, i = _first_pass_raw(q, xarr, auxt, validt, metric=Metric.IP, c=C,
                               ascending=False)
        return d

    def make_loop(fn):
        # x16/aux/valid MUST be jit arguments, not closure captures: the
        # pallas_call lowering embeds captured device constants as MLIR
        # dense literals, so a 1M bf16 corpus blows the tunnel's
        # remote_compile body limit (observed HTTP 413; code_len tracked
        # corpus bytes at 131k)
        def step(it, carry):
            q, xarr, auxt, validt, acc = carry
            qi = q + (it.astype(jnp.float32) * 1e-3)
            return (q, xarr, auxt, validt, acc + fn(qi, xarr, auxt, validt)[:, :8])

        @jax.jit
        def run(q, xarr, auxt, validt):
            *_, acc = jax.lax.fori_loop(
                0, ITERS, step,
                (q, xarr, auxt, validt,
                 jnp.zeros((q.shape[0], 8), jnp.float32)))
            return acc

        return run

    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    # PALLAS_PROBE_VARIANTS=pallas (or xla) runs one leg only — the Mosaic
    # compile through the tunnel can exceed a whole A/B run's budget, so
    # legs are resumable (the persistent compile cache carries the result
    # into the next full run)
    want = [t.strip() for t in
            os.environ.get("PALLAS_PROBE_VARIANTS", "xla,pallas").split(",")
            if t.strip()]
    unknown = [n for n in want if n not in ("xla", "pallas")]
    if unknown or not want:
        raise SystemExit(f"PALLAS_PROBE_VARIANTS must name xla/pallas, got {want!r}")
    for name, fn in (("xla", xla_pass), ("pallas", pallas_pass)):
        if name not in want:
            continue
        run = make_loop(fn)
        t0 = time.perf_counter()
        np.asarray(run(q, x16, aux, valid))
        compile_s = time.perf_counter() - t0
        # 3 timed reps: the first timed call of the first-compiled
        # executable in a process reads ~25x slow on this tunnel
        # (benchmarks/topc_epilogue_r05.log) — steady state is rep1+
        for rep in range(3):
            t0 = time.perf_counter()
            np.asarray(run(q + np.float32(1.0 + rep), x16, aux, valid))
            wall = time.perf_counter() - t0
            bw = n_pad * D * 2 * ITERS / wall / 1e9
            print(f"B={B} {name:7s} rep{rep}: {wall / ITERS * 1e3:8.3f} ms/scan "
                  f"(corpus bw {bw:7.1f} GB/s, compile+1st {compile_s:.1f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
