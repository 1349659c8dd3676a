#!/usr/bin/env bash
# Round-5 hardware evidence chain (dev-tunnel TPU). Addresses VERDICT r4
# items 2 (pallas timing), 3 (streaming graph recall), 4 (quantized gates).
# Each stage bounded by timeout so one hang cannot eat the round.
set -uo pipefail
cd "$(dirname "$0")/.."
DATA=benchmarks/data/synth_sift_1m

if [ ! -f "$DATA/sift_base.fvecs" ]; then
  echo "== [0] regenerate SIFT-shaped corpus =="
  python - <<'EOF'
import sys, shutil, os
sys.path.insert(0, 'benchmarks')
from sift_bench import synth_sift
tmp = synth_sift(1_000_000, 200)
os.makedirs('benchmarks/data', exist_ok=True)
dest = 'benchmarks/data/synth_sift_1m'
if os.path.exists(dest):
    shutil.rmtree(dest)
shutil.move(tmp, dest)
print('corpus at', dest)
EOF
fi

echo "== [1] quantized gates at 1M (SIFT-shaped) =="
timeout 2700 python benchmarks/gate_index_modes.py --sift "$DATA" --n 1000000 \
  --queries 20 --modes FLAT-IP FLAT-IP-SQ8 FLAT-L2-SQ8 FLAT-IP-PQ \
  FLAT-IP-RABITQ FLAT-IP-POLARVEC 2>&1 | grep -v WARNING | tee GATES_r05.jsonl \
  || echo "quantized gates FAILED (continuing)"

echo "== [2] streaming scan probe (1M under 128MB budget) =="
timeout 2700 python scripts/streaming_scan_probe.py 1000000 2>&1 \
  | grep -v WARNING | tee benchmarks/streaming_scan_r05.log \
  || echo "streaming probe FAILED (continuing)"

echo "== [3] pallas device A/B, one leg per process =="
( PALLAS_PROBE_VARIANTS=xla timeout 900 python scripts/pallas_probe.py 1000000 256 20
  PALLAS_PROBE_VARIANTS=pallas timeout 1500 python scripts/pallas_probe.py 1000000 256 20 ) 2>&1 \
  | grep -v WARNING | tee benchmarks/pallas_probe_r05.log \
  || echo "pallas probe FAILED (continuing)"

echo "EVIDENCE CHAIN DONE"
