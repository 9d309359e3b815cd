#!/usr/bin/env python3
"""Per-family perf regression gate.

Usage: python3 scripts/check_bench.py [BENCH_BUDGET.json [BENCH_LOCAL.json]]

Compares the freshest local bench run against the committed per-family
budgets. Families (q/r/t/d/s/e/m/p — the name prefix before the digits)
are the gating unit: individual sub-second queries swing with GC/loop
noise, but a family subtotal only moves when a shared stage (signature
pipeline, a join strategy, codegen) actually regresses.

Budget semantics: each family has a ceiling in wall seconds at the
budget's SF/CPU shape (sf0.1, local bench harness, min-of-3). A family
over its ceiling fails the gate. New families (operators added since the
budget was last refreshed) warn rather than fail — refresh the budget
with --refresh once their cost is intentional.

  python3 scripts/check_bench.py --refresh   # rewrite budgets from
                                             # BENCH_LOCAL.json * margin
"""
import json
import sys
from pathlib import Path

MARGIN = 1.6  # headroom over the measured family total when refreshing


def load(p):
    return json.loads(Path(p).read_text())


def refresh(budget_path, local_path):
    local = load(local_path)
    fams = local.get("families") or {}
    if not fams:
        print(f"no 'families' key in {local_path} — rerun graft.Bench first")
        return 1
    budget = {
        "sf": local.get("sf"),
        "margin": MARGIN,
        "families": {f: round(v * MARGIN, 2) for f, v in sorted(fams.items())},
        "total": round(local["value"] * MARGIN, 2),
    }
    for k in sorted(local):
        if k.endswith("_build"):
            budget[k] = round(local[k] * MARGIN, 2)
    # PER-QUERY shuffle ceilings. Wall seconds drift with GC and machine
    # load; shuffle bytes are a property of the PLAN — a query whose
    # broadcast silently falls back to a corpus shuffle blows through its
    # own ceiling even when its wall time hides in family noise (a single
    # global max would only catch regressions in the top shuffler). The
    # +0.5 MB grace absorbs partition-count jitter on near-zero queries.
    sh = local.get("shuffle_mb") or {}
    if sh:
        budget["shuffle_mb"] = {
            q: round(v * MARGIN + 0.5, 2) for q, v in sorted(sh.items())}
    Path(budget_path).write_text(json.dumps(budget, indent=2) + "\n")
    print(f"refreshed {budget_path} from {local_path} (margin {MARGIN}x)")
    return 0


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    budget_path = args[0] if len(args) > 0 else "BENCH_BUDGET.json"
    local_path = args[1] if len(args) > 1 else "BENCH_LOCAL.json"
    if "--refresh" in argv:
        return refresh(budget_path, local_path)
    budget, local = load(budget_path), load(local_path)
    fams = local.get("families") or {}
    n_fail = 0
    for fam, ceiling in sorted(budget["families"].items()):
        got = fams.get(fam)
        if got is None:
            print(f"warn {fam}: in budget but absent from local run")
            continue
        status = "FAIL" if got > ceiling else "ok"
        n_fail += got > ceiling
        print(f"{status:4} {fam:3} {got:7.2f}s / budget {ceiling:.2f}s")
    for fam in sorted(set(fams) - set(budget["families"])):
        print(f"warn {fam}: new family, no budget yet ({fams[fam]:.2f}s) — "
              f"run --refresh once intentional")
    for k in sorted(budget):
        if not k.endswith("_build") or local.get(k) is None:
            continue
        status = "FAIL" if local[k] > budget[k] else "ok"
        n_fail += local[k] > budget[k]
        print(f"{status:4} {k} {local[k]:.2f}s / budget {budget[k]:.2f}s")
    sh = local.get("shuffle_mb") or {}
    sh_budget = budget.get("shuffle_mb") or {}
    if sh and sh_budget:
        over = [(q, v, sh_budget[q]) for q, v in sorted(sh.items())
                if q in sh_budget and v > sh_budget[q]]
        for q, v, ceil_v in over:
            print(f"FAIL shuffle {q}: {v:.2f} MB / budget {ceil_v:.2f} MB")
        n_fail += len(over)
        fresh = sorted(set(sh) - set(sh_budget))
        if fresh:
            print(f"warn shuffle: {len(fresh)} queries without a shuffle "
                  f"budget yet — run --refresh once intentional")
        top = sorted(sh.items(), key=lambda kv: -kv[1])[:5]
        print(("ok  " if not over else "    ") +
              f" shuffle: {len(sh) - len(over)}/{len(sh)} under budget; top: " +
              ", ".join(f"{k}={v:.2f}MB" for k, v in top))
    if local["value"] > budget["total"]:
        n_fail += 1
        print(f"FAIL total {local['value']:.2f}s / budget {budget['total']:.2f}s")
    else:
        print(f"ok   total {local['value']:.2f}s / budget {budget['total']:.2f}s")
    print(("PASS" if n_fail == 0 else "FAIL") + f" ({n_fail} over budget)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
