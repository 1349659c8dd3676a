#!/usr/bin/env bash
# Round-3 hardware gate-matrix run.
# Non-graph modes gate at the full 1M corpus; graph modes (HNSW/DiskANN x2)
# gate at 200k — their 1M-scale evidence is the SIFT_r03.json DiskANN run
# (a 1M graph build is ~2h through the dev tunnel; 4 of them do not fit a
# round). Writes GATES_r03.jsonl at the repo root.
set -u
cd "$(dirname "$0")/.."
out=GATES_r03.jsonl
: > "$out"
echo "# gate matrix, round 3 — non-graph modes at n=1,000,000" >> "$out"
python benchmarks/gate_index_modes.py --n 1000000 --queries 20 \
  --modes FLAT-IP FLAT-L2 FLAT-COS FLAT-IP-SQ8 FLAT-L2-SQ8 FLAT-IP-PQ \
          FLAT-IP-RABITQ FLAT-IP-POLARVEC IVF-IP IVF-L2 SPANN-L2 \
  | tee -a "$out"
rc1=$?
echo "# graph modes at n=100,000 (fixed-IP-construction rerun; 1M graph builds cost ~2h each through the dev tunnel)" >> "$out"
python benchmarks/gate_index_modes.py --n 100000 --queries 20 \
  --modes HNSW-L2 HNSW-IP DISKANN-L2 DISKANN-IP \
  | tee -a "$out"
rc2=$?
echo "gate rcs: $rc1 $rc2"
exit $(( rc1 || rc2 ))
