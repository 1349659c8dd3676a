#!/usr/bin/env bash
# The dev-tunnel relay died mid-round (2026-08-17 ~20:30); this wrapper
# waits for the TPU tunnel to come back (bounded) and then runs the whole
# remaining round-4 hardware-evidence chain unattended, highest value first:
#   1. the two raw-MIPS graph gate rows   -> GATES_r04_graphs.jsonl
#   2. DiskANN batch-QPS / expand sweep   -> benchmarks/diskann_batch_qps_r04.log
#   3. perf-gate baseline, Pallas A/B, >HBM streaming, cross-engine bench
#      (scripts/run_tpu_evidence_r04.sh)
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

echo "== [A] raw-MIPS graph gate rerun =="
bash scripts/run_gates_r04_graphs.sh || echo "gate rerun FAILED (continuing)"

echo "== [B] DiskANN batch-QPS / expand sweep =="
python scripts/diskann_batch_qps_probe.py 2>&1 | grep -v WARNING \
  | tee benchmarks/diskann_batch_qps_r04.log \
  || echo "batch QPS probe FAILED (continuing)"

echo "== [C] remaining evidence chain =="
bash scripts/run_tpu_evidence_r04.sh

echo "CHAIN DONE"
