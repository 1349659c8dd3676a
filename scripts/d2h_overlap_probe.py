"""Does copy_to_host_async hide the tunnel's ~33 ms D2H fetch?

Three measurements over a stream of 8 dependent dispatch+fetch cycles of
a (128, 64) i32 shortlist-shaped result:

  sync     — np.asarray per cycle (the current resolver behavior)
  async    — copy_to_host_async right after dispatch, np.asarray at the
             end of the stream (resolver behavior with an eager D2H kick)
  interleave — copy_to_host_async on cycle i, np.asarray(cycle i-2) --
             the search_stream drain pattern with 2 windows in flight

Usage: python scripts/d2h_overlap_probe.py [CYCLES]
"""

from __future__ import annotations

import sys
import time

import numpy as np

CYCLES = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)

    @jax.jit
    def work(x, s):
        # a few ms of real device work so transfers have compute to hide in
        y = x
        for _ in range(4):
            y = (y @ x.T @ x) * 1e-3 + s
        i = jnp.argsort(y[:, 0])[:128].astype(jnp.int32)
        return jnp.tile(i[:, None], (1, 64))

    x = jnp.asarray(np.random.default_rng(0).normal(size=(512, 512)).astype(np.float32))
    for rep in range(3):  # first-executable artifact: steady state is rep2
        work(x, jnp.float32(rep)).block_until_ready()

    def run_sync():
        outs = []
        for i in range(CYCLES):
            o = work(x, jnp.float32(i))
            outs.append(np.asarray(o))
        return outs

    def run_async():
        handles = []
        for i in range(CYCLES):
            o = work(x, jnp.float32(i + 100))
            try:
                o.copy_to_host_async()
            except Exception as e:  # noqa: BLE001
                print(f"copy_to_host_async unsupported: {e!r}", flush=True)
                raise SystemExit(1)
            handles.append(o)
        return [np.asarray(h) for h in handles]

    def run_interleave():
        handles, outs = [], []
        for i in range(CYCLES):
            o = work(x, jnp.float32(i + 200))
            o.copy_to_host_async()
            handles.append(o)
            if len(handles) > 2:
                outs.append(np.asarray(handles.pop(0)))
        outs.extend(np.asarray(h) for h in handles)
        return outs

    for name, fn in (("sync", run_sync), ("async", run_async),
                     ("interleave", run_interleave)):
        fn()  # warm
        t0 = time.perf_counter()
        fn()
        wall = (time.perf_counter() - t0) * 1e3
        print(f"{name:10s}: {wall:8.2f} ms total = {wall / CYCLES:7.2f} ms/cycle",
              flush=True)


if __name__ == "__main__":
    main()
