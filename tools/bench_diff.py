#!/usr/bin/env python3
"""Bench regression diff: compare two Bench JSON lines (BENCH_LOCAL.json /
BENCH_r*.json) and flag per-query regressions.

Usage: bench_diff.py BASE.json NEW.json [--ratio 1.5] [--min-sec 0.5]

A query is flagged when new/base >= ratio AND new-base >= min-sec (the
min-sec floor keeps 0.1s->0.2s planner jitter out of the report). Exits 1
when any regression is flagged, so it can gate a commit. Noise guards: a
run whose gc_sec > 5% of value, or whose wall_sec exceeds value by > 30%,
is labeled CONTENDED -- treat its per-query numbers as upper bounds and
re-run on a quiet box before acting (SCALE.md benchmark-number caveat).
"""
import json, sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"{path}: no JSON line found")


def contended(b):
    val, gc, wall = b.get("value", 0), b.get("gc_sec", 0), b.get("wall_sec", 0)
    notes = []
    if val and gc > 0.05 * val:
        notes.append(f"gc_sec={gc:.1f} (> 5% of {val:.1f})")
    if val and wall > 1.3 * val:
        notes.append(f"wall_sec={wall:.1f} (> 1.3x value {val:.1f})")
    return notes


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), True)
                for a in sys.argv[1:] if a.startswith("--"))
    if len(args) != 2:
        raise SystemExit(__doc__)
    ratio = float(opts.get("ratio", 1.5))
    min_sec = float(opts.get("min-sec", 0.5))
    base, new = load(args[0]), load(args[1])
    bq, nq = base.get("queries", {}), new.get("queries", {})

    for name, b in (("BASE", base), ("NEW", new)):
        errs = b.get("errors") or {}
        for q, e in errs.items():
            print(f"{name} ERROR {q}: {e}")
        for note in contended(b):
            print(f"{name} CONTENDED: {note}")

    added = sorted(set(nq) - set(bq))
    removed = sorted(set(bq) - set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    shared = sorted(set(bq) & set(nq))
    regressions, improvements = [], []
    for q in shared:
        b, n = bq[q], nq[q]
        if b > 0 and n / b >= ratio and n - b >= min_sec:
            regressions.append((n / b, q, b, n))
        elif n > 0 and b / n >= ratio and b - n >= min_sec:
            improvements.append((b / n, q, b, n))
    for r, q, b, n in sorted(regressions, reverse=True):
        print(f"REGRESSION {q}: {b:.2f}s -> {n:.2f}s ({r:.1f}x)")
    for r, q, b, n in sorted(improvements, reverse=True):
        print(f"improved   {q}: {b:.2f}s -> {n:.2f}s ({r:.1f}x faster)")

    tb = sum(bq[q] for q in shared)
    tn = sum(nq[q] for q in shared)
    print(f"shared {len(shared)} queries: base {tb:.1f}s -> new {tn:.1f}s "
          f"({tn / tb:.2f}x)" if tb else "no shared queries")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
