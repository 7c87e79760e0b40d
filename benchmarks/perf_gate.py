"""Perf regression gate: bench.py's JSON line vs budgets.json.

TPU counterpart of the reference's dfx perf suites (reference
tests/dfx/perf/test_qwen_image_vllm_omni.json — JSON metric budgets a
CI step fails on).  Usage:

    python benchmarks/perf_gate.py                 # runs bench.py
    python benchmarks/perf_gate.py --json '<line>' # gate a recorded line
    python benchmarks/perf_gate.py --file BENCH_r02.json

Exit 0 = all budgets met; exit 1 lists every breach.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def check(metrics: dict, budgets: dict) -> list[str]:
    """Returns a list of human-readable breaches (empty = pass)."""
    breaches = []
    for key, lo in budgets.get("min", {}).items():
        v = metrics.get(key)
        if v is None:
            breaches.append(f"{key}: missing (min {lo})")
        elif float(v) < float(lo):
            breaches.append(f"{key}: {v} < min {lo}")
    for key, hi in budgets.get("max", {}).items():
        v = metrics.get(key)
        if v is None:
            breaches.append(f"{key}: missing (max {hi})")
        elif float(v) > float(hi):
            breaches.append(f"{key}: {v} > max {hi}")
    return breaches


def _metrics_from_driver_record(data: dict) -> dict:
    """Accept either bench.py's raw line or a driver BENCH_r*.json."""
    if "parsed" in data:
        return data["parsed"]
    return data


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", help="one bench.py JSON line to gate")
    ap.add_argument("--file", help="bench JSON file (driver record ok)")
    ap.add_argument(
        "--budgets", default=str(ROOT / "benchmarks" / "budgets.json")
    )
    args = ap.parse_args()
    budgets = json.loads(open(args.budgets).read())
    if args.json:
        metrics = json.loads(args.json)
    elif args.file:
        metrics = _metrics_from_driver_record(
            json.loads(open(args.file).read())
        )
    else:
        out = subprocess.run(
            [sys.executable, str(ROOT / "bench.py")],
            capture_output=True, text=True, timeout=580,
        )
        line = out.stdout.strip().splitlines()[-1]
        metrics = json.loads(line)
    breaches = check(metrics, budgets)
    if breaches:
        print("PERF GATE FAILED:")
        for b in breaches:
            print("  -", b)
        return 1
    print("perf gate ok:", json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
