"""HBM-roofline accounting for the bf16 first-pass scan at 1M x 128.

VERDICT r4 read the B=256 scan's 139.5 GB/s *corpus-read* bandwidth as
"~17% of roofline". That accounting counts only the 256 MB bf16 corpus
read; the XLA dataflow also writes and re-reads the (B, N) f32 score block
consumed by the approx_max_k PartialReduce (B=256: 1 GB each way). This
probe times the first pass across batch sizes and reports BOTH numbers:
corpus-only bandwidth and total-traffic bandwidth (corpus read + score
write + score read). On a v5e (~819 GB/s HBM) the total-traffic figure is
the honest utilization; the corpus-only figure crosses 400 GB/s once the
batch is small enough that score traffic stops dominating.

Run:  timeout 590 python scripts/scan_roofline_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import lynsedb_tpu.ops.scan as S
from lynsedb_tpu.metrics import Metric

N, D = 1_000_000, 128


def main():
    import jax
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(3)
    corpus = S.DeviceCorpus(dim=D)
    for _ in range(4):
        corpus.append(rng.standard_normal((N // 4, D)).astype(np.float32))
    corpus._ensure_staged()
    x16, aux, valid = corpus._dev16, corpus.bf16_aux(), corpus.valid_mask()
    corpus_bytes = corpus.capacity * D * 2

    for b in (16, 64, 256):
        q = S._put(rng.standard_normal((b, D)).astype(np.float32))
        c = corpus._shortlist_size(10, N)
        out = S.bf16_pass_ids(q, x16, aux, valid, metric=Metric.IP, k=c,
                              ascending=False)
        out.block_until_ready()
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = S.bf16_pass_ids(q, x16, aux, valid, metric=Metric.IP, k=c,
                                  ascending=False)
        out.block_until_ready()
        ms = (time.perf_counter() - t0) / reps * 1e3
        score_bytes = b * corpus.capacity * 4
        bw_corpus = corpus_bytes / (ms / 1e3) / 1e9
        bw_total = (corpus_bytes + 2 * score_bytes) / (ms / 1e3) / 1e9
        print(f"B={b:4d} first pass: {ms:7.3f} ms | corpus-only "
              f"{bw_corpus:6.1f} GB/s | total-traffic {bw_total:6.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
