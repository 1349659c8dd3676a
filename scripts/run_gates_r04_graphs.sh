#!/usr/bin/env bash
# Round-4 graph-mode gate rerun (after the HNSW-IP entry-scan fix and the
# DiskANN raw-MIPS search tuning): the two raw-MIPS graph rows (HNSW-L2/DISKANN-L2 already passed at 0.99 in GATES_r04.jsonl) at 1M on the
# SIFT-shaped corpus with 100 queries (tighter recall estimate than the
# 20-query matrix run). WRITES (truncates) GATES_r04_graphs.jsonl — both
# rows come from the single run.
set -euo pipefail
cd "$(dirname "$0")/.."
# write atomically so a mid-run failure can't truncate rows a prior
# (e.g. CPU-fallback) run already recorded
python benchmarks/gate_index_modes.py --sift benchmarks/data/synth_sift_1m \
  --n 1000000 --queries 100 \
  --modes HNSW-IP DISKANN-IP | tee GATES_r04_graphs.jsonl.tmp
mv GATES_r04_graphs.jsonl.tmp GATES_r04_graphs.jsonl
