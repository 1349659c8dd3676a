#!/usr/bin/env bash
# Round-4 remaining hardware evidence, run serially on the tunnel TPU:
#   1. TPU perf-gate baseline (scripts/perf_baseline.json) + one gate check
#   2. Pallas fused-kernel device A/B  -> benchmarks/pallas_probe_r04.log
#   3. >HBM streaming scan at 1M       -> benchmarks/streaming_scan_r04.log
#   4. Cross-engine same-host bench    -> CROSSBENCH_r04.json
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== [1/4] perf-gate TPU baseline =="
python scripts/perf_gate.py --update && python scripts/perf_gate.py \
  || echo "perf_gate FAILED (continuing)"

echo "== [2/4] pallas device A/B =="
( python scripts/pallas_probe.py 1000000 64 20
  python scripts/pallas_probe.py 1000000 256 20 ) 2>&1 \
  | grep -v WARNING | tee benchmarks/pallas_probe_r04.log \
  || echo "pallas probe FAILED (continuing)"

echo "== [3/4] streaming 1M =="
LYNSE_TPU_HBM_BYTES=134217728 python scripts/streaming_scan_probe.py 1000000 2>&1 \
  | grep -v WARNING | tee benchmarks/streaming_scan_r04.log \
  || echo "streaming probe FAILED (continuing)"

echo "== [4/4] cross-engine bench =="
python benchmarks/cross_engine_bench.py --n 1000000 --queries 50 \
  --out CROSSBENCH_r04.json || echo "crossbench FAILED (continuing)"

echo "ALL DONE"
