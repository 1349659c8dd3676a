#!/usr/bin/env bash
# The dev-tunnel relay died mid-round (2026-08-17 ~20:30); this wrapper
# waits for the TPU tunnel to come back (bounded) and then runs the whole
# remaining round-4 hardware-evidence chain unattended.
#
# Order: FAST hardware-only evidence first (perf-gate baseline, Pallas A/B,
# >HBM streaming, cross-engine bench — minutes each), then the DiskANN
# batch-QPS sweep on the saved 1M index, and LAST the 1M graph-gate rerun
# (hours of rebuilds; its recall rows are backend-independent and the CPU
# fallback run already produces them).
set -uo pipefail
cd "$(dirname "$0")/.."

deadline=$(( $(date +%s) + ${TUNNEL_WAIT_S:-32400} ))
until ss -tln 2>/dev/null | grep -q "127.0.0.1:808"; do
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "tunnel never came back; giving up" >&2
    exit 1
  fi
  sleep 60
done
echo "$(date) tunnel back — settling 120s before first dispatch"
sleep 120

echo "== [A] fast hardware evidence chain =="
bash scripts/run_tpu_evidence_r04.sh

echo "== [B] DiskANN batch-QPS / expand sweep =="
python scripts/diskann_batch_qps_probe.py 2>&1 | grep -v WARNING \
  | tee benchmarks/diskann_batch_qps_r04.log \
  || echo "batch QPS probe FAILED (continuing)"

echo "== [C] raw-MIPS graph gate rerun on-device (atomic write) =="
if bash scripts/run_gates_r04_graphs.sh; then
  echo "on-device gate rerun OK"
else
  echo "gate rerun FAILED (CPU fallback rows stand)"
fi

echo "CHAIN DONE"
