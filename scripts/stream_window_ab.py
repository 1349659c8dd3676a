"""Production-path A/B of the search_stream auto window at 1M x 128.

Builds a real collection (client -> engine -> DeviceCorpus), then times the
100-query stream with explicit window=128 (old auto) vs window=64 (new
auto, two co-flying windows per segment), best-of-5 each, interleaved so
tunnel weather hits both arms equally.

Usage: python scripts/stream_window_ab.py [N] [REPS]
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
D, K, NQ = 128, 10, 100


def main() -> None:
    import lynsedb_tpu as lynse

    rng = np.random.default_rng(0)
    queries = rng.normal(size=(NQ, D)).astype(np.float32)
    with tempfile.TemporaryDirectory(prefix=".sab_") as tmp:
        client = lynse.VectorDBClient(tmp)
        db = client.create_database("ab", drop_if_exists=True)
        coll = db.require_collection("v", dim=D)
        for s in range(0, N, 250_000):
            m = min(250_000, N - s)
            coll.add(list(range(s, s + m)),
                     vectors=rng.normal(size=(m, D)).astype(np.float32))
        coll.commit()
        t0 = time.perf_counter()
        coll.search(queries[0], k=K)
        print(f"warm-up: {time.perf_counter() - t0:.1f}s", flush=True)

        for w in (128, 64, None):
            coll.search_stream(queries, k=K, window=w)  # warm shapes
        best = {128: float("inf"), 64: float("inf"), None: float("inf")}
        for rep in range(REPS):
            for w in (128, 64, None):
                t0 = time.perf_counter()
                out = coll.search_stream(queries, k=K, window=w)
                best[w] = min(best[w], time.perf_counter() - t0)
                assert len(out) == NQ
        for w in (128, 64, None):
            label = f"window={w}" if w else "auto    "
            print(f"{label}: best {best[w] * 1e3:7.2f} ms "
                  f"-> {best[w] / NQ * 1e3:.3f} ms/query", flush=True)
        client.close()


if __name__ == "__main__":
    main()
