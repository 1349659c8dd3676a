"""HTTP concurrent-serving probe (VERDICT r4 item 7: >= 1,000 QPS at 100k).

Same methodology as bench.py's service section — real server, real client,
distinct per-request vectors so the SearchCache can't serve the load — but
standalone so transport changes can be measured without the 1M ingest.

    python scripts/http_conc_probe.py [n_rows] [tiers...]
"""

import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import lynsedb_tpu as lynse
from lynsedb_tpu.server.app import BackgroundServer

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
TIERS = [int(t) for t in sys.argv[2:]] or [16, 64, 128, 256]
D, K = 128, 10

rng = np.random.default_rng(0)
hv = rng.standard_normal((N, D), dtype=np.float32)
queries = rng.standard_normal((256, D), dtype=np.float32)

def stage(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


scratch = os.environ.get("BENCH_TMPDIR", str(Path(__file__).resolve().parent.parent))
with tempfile.TemporaryDirectory(dir=scratch) as tmp:
    stage("starting server")
    srv = BackgroundServer(os.path.join(tmp, "srv"), port=0)
    stage(f"server up at {srv.url}")
    # first search absorbs the device executable compile on a cold cache
    hc = lynse.VectorDBClient(srv.url, timeout=900.0)
    hdb = hc.create_database("hconc", drop_if_exists=True)
    hcoll = hdb.require_collection("v", dim=D)
    stage("ingesting")
    for start in range(0, N, 50_000):
        stop = min(start + 50_000, N)
        hcoll.add(list(range(start, stop)), vectors=hv[start:stop])
    stage("committing")
    hcoll.commit()
    stage("warming")
    t0 = time.perf_counter()
    hcoll.search(queries[0], k=K)
    print(f"warm (compile + first search): {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    for i in range(50):
        hcoll.search(queries[i % 256], k=K)
    print(f"sequential: {(time.perf_counter()-t0)/50*1e3:.3f} ms/q", flush=True)

    for workers in TIERS:
        n_req = max(200, workers * 10)
        conc_q = (queries[np.arange(n_req) % 256]
                  + np.float32(1e-3) * np.arange(n_req)[:, None]).astype(np.float32)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(  # warm the coalesced executables for this tier
                lambda i: hcoll.search(conc_q[i] + np.float32(0.5), k=K),
                range(workers)))
            t0 = time.perf_counter()
            list(pool.map(lambda i: hcoll.search(conc_q[i], k=K), range(n_req)))
            dt = time.perf_counter() - t0
        stats = dict(getattr(srv.server, "microbatch_stats", {}) or {})
        print(f"concurrent {workers:3d} threads ({n_req} req): "
              f"{1e3*dt/n_req:.3f} ms/q | QPS {n_req/dt:,.0f} | batcher {stats}",
              flush=True)
    srv.stop()
