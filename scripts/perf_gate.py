"""A/B perf gate: run the headline bench on the current tree and compare
against a checked-in baseline (reference: scripts/perf_gate_local.py:78-92 —
15% relative regression budget, 5 ms absolute search budget).

Usage:
    python scripts/perf_gate.py            # compare vs scripts/perf_baseline.json
    python scripts/perf_gate.py --update   # record the current numbers as baseline
    BENCH_N=200000 python scripts/perf_gate.py   # smaller corpus

Exits nonzero when any metric regresses past its budget.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BASELINE_PATH = Path(__file__).resolve().parent / "perf_baseline.json"

RELATIVE_BUDGET = 0.15  # 15% regression allowed (perf_gate_local.py:80-83)
SEARCH_ABS_BUDGET_MS = 5.0  # absolute pipelined-search budget (:85-88)
# ingest is disk/CPU-bound and this environment's host I/O is erratic
# (>40% run-to-run swings measured on identical trees) — wider budget
INGEST_RELATIVE_BUDGET = 0.5

# metric name -> (regex over bench stderr, higher_is_better)
METRICS = {
    "ingest_vec_s": (re.compile(r"ingest: .* = ([\d,]+) vec/s"), True),
    "pipelined_ms": (re.compile(r"pipelined search \(auto window\): mean ([\d.]+) ms"), False),
    "filtered_pipelined_ms": (re.compile(r"filtered search .* pipelined: ([\d.]+) ms"), False),
    "batch64_qps": (re.compile(r"batch_search B=64: .* = ([\d,]+) QPS"), True),
    "batch256_qps": (re.compile(r"batch_search B=256: .* = ([\d,]+) QPS"), True),
    "recall_at_10": (re.compile(r"recall@10 vs exact ground truth: ([\d.]+)"), True),
}


def run_bench() -> dict:
    env = dict(os.environ)
    env.setdefault("BENCH_N", "200000")
    env.setdefault("BENCH_QUERIES", "50")
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=3600,
    )
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"bench failed rc={proc.returncode}")
    text = proc.stderr
    out = {}
    for name, (pat, _) in METRICS.items():
        m = pat.search(text)
        if m:
            out[name] = float(m.group(1).replace(",", ""))
    out["bench_n"] = int(env["BENCH_N"])
    # take the platform from the child bench's own JSON line: importing jax
    # here would initialize the device plugin in THIS process (a dead tunnel
    # wedges it), and the child may have fallen back to CPU independently
    out["platform"] = "unknown"
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if "platform" in rec:
            out["platform"] = rec["platform"]
            break
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true", help="record current numbers as the baseline")
    args = ap.parse_args()

    current = run_bench()
    print(json.dumps({"current": current}, indent=2))

    if args.update or not BASELINE_PATH.exists():
        BASELINE_PATH.write_text(json.dumps(current, indent=2) + "\n")
        print(f"baseline written to {BASELINE_PATH}")
        return

    baseline = json.loads(BASELINE_PATH.read_text())
    if baseline.get("bench_n") != current.get("bench_n"):
        print(f"baseline bench_n {baseline.get('bench_n')} != current {current.get('bench_n')}; "
              "rerun with matching BENCH_N or --update", file=sys.stderr)
        raise SystemExit(2)
    if baseline.get("platform") and baseline["platform"] != current.get("platform"):
        print(f"baseline platform {baseline['platform']!r} != current "
              f"{current.get('platform')!r}; the comparison would mix hardware — "
              "rerun on the baseline's platform or --update", file=sys.stderr)
        raise SystemExit(2)

    failures = []
    for name, (_, higher_better) in METRICS.items():
        if name not in baseline or name not in current:
            continue
        base, cur = baseline[name], current[name]
        if name == "recall_at_10":
            ok = cur >= base - 1e-3
        elif higher_better:
            budget = INGEST_RELATIVE_BUDGET if name == "ingest_vec_s" else RELATIVE_BUDGET
            ok = cur >= base * (1.0 - budget)
        else:
            ok = cur <= base * (1.0 + RELATIVE_BUDGET) or cur <= SEARCH_ABS_BUDGET_MS
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: baseline {base} -> current {cur}")
        if not ok:
            failures.append(name)
    if failures:
        print(f"PERF GATE FAILURES: {failures}", file=sys.stderr)
        raise SystemExit(1)
    print("perf gate passed")


if __name__ == "__main__":
    main()
