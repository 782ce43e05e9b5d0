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
    best-of value. Returns (query_times, noise_probe_best_or_None)."""
    with open(path) as f:
        d = json.load(f)
    qs = dict(d.get("queries", {}))
    for q, ss in (d.get("samples") or {}).items():
        good = [t for t in (ss or []) if isinstance(t, (int, float)) and t >= 0]
        if good:
            qs[q] = min(good)
    probe = None
    ps = d.get("noise_probe_samples")
    if ps:
        good = [t for t in ps if isinstance(t, (int, float)) and t >= 0]
        if good:
            probe = min(good)
    elif isinstance(d.get("noise_probe_sec"), (int, float)):
        probe = d["noise_probe_sec"]
    return qs, probe


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

    (base, probe_b), (cur, probe_c) = load(a.baseline), load(a.current)
    if not base or not cur:
        print(f"[bench-diff] skipped: empty query map in "
              f"{a.baseline if not base else a.current}")
        return
    # Noise normalization: both runs timed the identical fixed-work probe
    # (3× ml_matrix post-warmup), so probe_c/probe_b measures how much
    # slower the CURRENT box/load is at running the same code. Divide each
    # current time by kappa before flagging — a uniformly-1.5×-noisier box
    # (r11's driver) then produces ratio≈1.0 instead of 20 phantom
    # regressions, while a genuine single-query regression stays ≈its real
    # ratio. Raw ratios are still printed; kappa is capped into [0.5, 3] so
    # a corrupt probe can't silence (or invent) everything.
    kappa = 1.0
    kappa_note = "no probe in baseline and/or current (raw ratios only)"
    if probe_b and probe_c and probe_b > 0 and probe_c > 0:
        kappa = max(0.5, min(3.0, probe_c / probe_b))
        kappa_note = (f"probe {probe_b:.2f}s -> {probe_c:.2f}s, "
                      f"kappa={kappa:.2f} (normalized = current / kappa)")
    regressions, improved, added, removed = [], [], [], []
    for q, t in sorted(cur.items()):
        if q not in base:
            added.append((q, t))
            continue
        b = base[q]
        if b <= 0 or t <= 0:
            continue
        ratio = t / b
        norm = (t / kappa) / b
        if norm > threshold and t >= min_sec:
            regressions.append((q, b, t, ratio, norm))
        elif norm < 1.0 / threshold and b >= min_sec:
            improved.append((q, b, t, ratio, norm))
    for q in sorted(base):
        if q not in cur:
            removed.append(q)

    tb = sum(v for v in base.values() if v > 0)
    tc = sum(v for v in cur.values() if v > 0)
    ratio_s = f"{tc / tb:.2f}x" if tb > 0 else "n/a"
    print(f"[bench-diff] total: {tb:.1f}s -> {tc:.1f}s "
          f"({ratio_s}) over {len(cur)} queries "
          f"(+{len(added)} new, -{len(removed)} removed)")
    print(f"[bench-diff] noise probe: {kappa_note}")
    if improved:
        print(f"[bench-diff] improved >{threshold}x (normalized):")
        for q, b, t, r, n in sorted(improved, key=lambda x: x[4]):
            print(f"  [ok]   {q:36s} {b:8.2f}s -> {t:7.2f}s "
                  f"(raw {r:.2f}x, norm {n:.2f}x)")
    if regressions:
        print(f"[bench-diff] REGRESSED >{threshold}x "
              f"(normalized, warm >= {min_sec}s):")
        for q, b, t, r, n in sorted(regressions, key=lambda x: -x[4]):
            print(f"  [WARN] {q:36s} {b:8.2f}s -> {t:7.2f}s "
                  f"(raw {r:.2f}x, norm {n:.2f}x)")
    else:
        print(f"[bench-diff] no regressions beyond {threshold}x (normalized)")
    if regressions and fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
