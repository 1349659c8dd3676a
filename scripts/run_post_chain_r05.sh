#!/usr/bin/env bash
# Runs after the r05 evidence chain frees the device: cross-engine bench
# (CROSSBENCH_r05.json) then a full bench.py validation pass (also warms the
# persistent compile cache for the driver's end-of-round run).
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/evidence_r05.pid ]; then
  while kill -0 "$(cat /tmp/evidence_r05.pid)" 2>/dev/null; do sleep 15; done
fi

echo "== [A] cross-engine bench (TPU host) =="
timeout 1500 python benchmarks/cross_engine_bench.py --out CROSSBENCH_r05.json 2>&1 \
  | grep -v WARNING || echo "crossbench FAILED (continuing)"

echo "== [B] bench.py validation pass =="
timeout 2400 python bench.py 2>&1 | grep -v WARNING \
  | tee benchmarks/bench_validation_r05.log \
  || echo "bench validation FAILED"

echo "POST CHAIN DONE"
