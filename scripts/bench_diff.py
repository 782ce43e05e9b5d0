#!/usr/bin/env python3
"""Round-over-round bench regression table.

Compares a fresh bench_out.json against a baseline (the previous round's
bench_out.json, committed at round close) and prints per-query warm-time
deltas, flagging regressions.

    python3 scripts/bench_diff.py [BASELINE [CURRENT]] [--threshold X]
                                  [--min-sec S] [--fail]

Defaults: BASELINE=bench_out.json (committed), CURRENT=bench_out_new.json.
A query REGRESSES when current_warm > threshold * baseline_warm (default
1.5x) AND current_warm >= min-sec (default 0.3 s — sub-300ms queries are
dominated by per-job fixed costs and flap). --fail exits 1 on any
regression; without it the table is advisory (warn-only), matching the
gate's use: the judge reads intent from the table, a human decides whether
a flagged delta is a deliberate trade (documented in the commit) or a bug.
"""
import json
import signal
import sys

# behave under `| head` (default SIGPIPE handling, no traceback)
signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def load(path):
    """Per-query robust warm time: min over the raw sample array when
    present (box noise is one-sided — co-tenant interference only ever
    slows a run — so min-of-N is the best floor estimate and each extra
    sample cuts false-regression odds multiplicatively), else the stored
    best-of value."""
    with open(path) as f:
        d = json.load(f)
    qs = dict(d.get("queries", {}))
    for q, ss in (d.get("samples") or {}).items():
        good = [t for t in (ss or []) if isinstance(t, (int, float)) and t >= 0]
        if good:
            qs[q] = min(good)
    return qs


def main():
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("baseline", nargs="?", default="bench_out.json")
    p.add_argument("current", nargs="?", default="bench_out_new.json")
    p.add_argument("--threshold", type=float, default=1.5)
    p.add_argument("--min-sec", type=float, default=0.3, dest="min_sec")
    p.add_argument("--fail", action="store_true")
    a = p.parse_args()
    threshold, min_sec, fail = a.threshold, a.min_sec, a.fail

    base, cur = load(a.baseline), load(a.current)
    if not base or not cur:
        print(f"[bench-diff] skipped: empty query map in "
              f"{a.baseline if not base else a.current}")
        return
    regressions, improved, added, removed = [], [], [], []
    for q, t in sorted(cur.items()):
        if q not in base:
            added.append((q, t))
            continue
        b = base[q]
        if b <= 0 or t <= 0:
            continue
        ratio = t / b
        if ratio > threshold and t >= min_sec:
            regressions.append((q, b, t, ratio))
        elif ratio < 1.0 / threshold and b >= min_sec:
            improved.append((q, b, t, ratio))
    for q in sorted(base):
        if q not in cur:
            removed.append(q)

    tb = sum(v for v in base.values() if v > 0)
    tc = sum(v for v in cur.values() if v > 0)
    ratio_s = f"{tc / tb:.2f}x" if tb > 0 else "n/a"
    print(f"[bench-diff] total: {tb:.1f}s -> {tc:.1f}s "
          f"({ratio_s}) over {len(cur)} queries "
          f"(+{len(added)} new, -{len(removed)} removed)")
    if improved:
        print(f"[bench-diff] improved >{threshold}x:")
        for q, b, t, r in sorted(improved, key=lambda x: x[3]):
            print(f"  [ok]   {q:36s} {b:8.2f}s -> {t:7.2f}s ({r:.2f}x)")
    if regressions:
        print(f"[bench-diff] REGRESSED >{threshold}x (warm >= {min_sec}s):")
        for q, b, t, r in sorted(regressions, key=lambda x: -x[3]):
            print(f"  [WARN] {q:36s} {b:8.2f}s -> {t:7.2f}s ({r:.2f}x)")
    else:
        print(f"[bench-diff] no regressions beyond {threshold}x")
    if regressions and fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
