#!/usr/bin/env python3
"""Per-query bench history: append the freshest BENCH_LOCAL.json run to
BENCH_HISTORY.jsonl and report per-family / per-query drift across runs.

Usage:
  python3 scripts/bench_history.py            # append current run + drift vs previous
  python3 scripts/bench_history.py --report   # trend table only, no append

check_bench.py gates each run against absolute family budgets; this
tracks the *trajectory* between refreshes — a family creeping +10% per
round stays under a 1.6x budget for several rounds while steadily
regressing, and the history is what makes that visible. Per-query
deltas are reported only above a noise floor (>0.3s and >25%), the same
thresholds the round-4 verdict used to separate GC noise from real
regressions.
"""
import json
import sys
from pathlib import Path

HISTORY = Path("BENCH_HISTORY.jsonl")
NOISE_SEC, NOISE_REL = 0.3, 0.25


def load_runs():
    if not HISTORY.exists():
        return []
    return [json.loads(l) for l in HISTORY.read_text().splitlines() if l.strip()]


def report(runs):
    if not runs:
        print("no history yet")
        return
    fams = sorted(runs[-1]["families"])
    print(f"{'run':>4} {'n_q':>5} {'total':>8} " + " ".join(f"{f:>7}" for f in fams))
    for i, r in enumerate(runs):
        cells = " ".join(f"{r['families'].get(f, 0.0):7.2f}" for f in fams)
        print(f"{i:>4} {len(r['queries']):>5} {r['total']:8.2f} {cells}")
    if len(runs) >= 2:
        prev, cur = runs[-2], runs[-1]
        drifts = []
        for name, v in cur["queries"].items():
            p = prev["queries"].get(name)
            if p is None:
                continue
            if abs(v - p) > NOISE_SEC and abs(v - p) > NOISE_REL * max(p, 1e-9):
                drifts.append((name, p, v))
        if drifts:
            print("\nper-query drift beyond noise floor (>0.3s and >25%):")
            for name, p, v in sorted(drifts, key=lambda t: -(t[2] - t[1])):
                print(f"  {name:32s} {p:6.2f}s -> {v:6.2f}s ({(v - p) / p:+.0%})")
        else:
            print("\nno per-query drift beyond the noise floor vs previous run")


def main():
    runs = load_runs()
    if "--report" not in sys.argv:
        b = json.loads(Path("BENCH_LOCAL.json").read_text())
        entry = {
            "sf": b.get("sf"),
            "total": b.get("value"),
            "sigstore_build": b.get("sigstore_build"),
            "layout_build": b.get("layout_build"),
            "families": b.get("families", {}),
            "queries": b.get("queries", {}),
        }
        # idempotent append: skip if identical to the last recorded run
        if not runs or runs[-1] != entry:
            with HISTORY.open("a") as f:
                f.write(json.dumps(entry) + "\n")
            runs.append(entry)
            print(f"appended run {len(runs) - 1}")
        else:
            print("current run already recorded")
    report(runs)


if __name__ == "__main__":
    main()
