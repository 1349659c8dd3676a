#!/usr/bin/env bash
# Round-4 restart follow-up device chain. Waits for the fast evidence chain
# (pid in /tmp/evidence.pid) to finish, then runs the remaining queue:
#   1. Pallas device A/B (sys.path fix applied)  -> benchmarks/pallas_probe_r04.log
#   2. 1M raw-MIPS graph gate rerun              -> GATES_r04_graphs.jsonl
#   3. DiskANN 1M raw index build (persisted)    -> benchmarks/data/diskann_1m_raw_diag
#   4. DiskANN batch-QPS / expand sweep          -> benchmarks/diskann_batch_qps_r04.log
set -uo pipefail
cd "$(dirname "$0")/.."

if [ -f /tmp/evidence.pid ]; then
  while kill -0 "$(cat /tmp/evidence.pid)" 2>/dev/null; do sleep 30; done
fi

echo "== [1] pallas device A/B =="
( python scripts/pallas_probe.py 1000000 64 20
  python scripts/pallas_probe.py 1000000 256 20 ) 2>&1 \
  | grep -v WARNING | tee benchmarks/pallas_probe_r04.log \
  || echo "pallas probe FAILED (continuing)"

echo "== [2] raw-MIPS graph gate rerun on-device =="
if bash scripts/run_gates_r04_graphs.sh; then
  echo "on-device gate rerun OK"
else
  echo "gate rerun FAILED (CPU fallback rows stand)"
fi

echo "== [3] DiskANN 1M raw index build =="
python scripts/diskann_1m_raw_diag.py build 2>&1 | grep -v WARNING | tail -5 \
  || echo "raw diag build FAILED (continuing)"

echo "== [4] DiskANN batch-QPS sweep =="
python scripts/diskann_batch_qps_probe.py 2>&1 | grep -v WARNING \
  | tee benchmarks/diskann_batch_qps_r04.log \
  || echo "batch QPS probe FAILED (continuing)"

echo "FOLLOWUP DONE"
