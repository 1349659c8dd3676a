#!/usr/bin/env bash
# Round-4 hardware evidence runs (dev-tunnel TPU).
#
# Usage: scripts/run_gates_r04.sh [stage]
#   stage "gates1m"  — full index-mode matrix at 1M on the SIFT-shaped corpus
#                      -> GATES_r04.jsonl
#   stage "sift"     — SIFT-format north-star bench (FLAT + DiskANN at 1M)
#                      -> SIFT_r04.json
#   stage "coverage" — uniform-data IVF probe-coverage ceiling record
#                      -> benchmarks/ivf_coverage_r04.log
#
# The SIFT-shaped corpus must exist (benchmarks/data/synth_sift_1m —
# regenerate with sift_bench.synth_sift(1_000_000, 200)).
set -euo pipefail
cd "$(dirname "$0")/.."

STAGE="${1:-gates1m}"
DATA=benchmarks/data/synth_sift_1m

case "$STAGE" in
  gates1m)
    python benchmarks/gate_index_modes.py --sift "$DATA" --n 1000000 \
      --queries 20 | tee GATES_r04.jsonl
    ;;
  sift)
    python benchmarks/sift_bench.py --n 1000000 --queries 100 --out SIFT_r04.json
    ;;
  coverage)
    python scripts/ivf_diag.py 1000000 | tee benchmarks/ivf_coverage_r04.log
    ;;
  *)
    echo "unknown stage: $STAGE" >&2; exit 2 ;;
esac
