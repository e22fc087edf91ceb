#!/usr/bin/env python3
"""Round-over-round bench gate: FAIL (exit 1) when any per-query median
regresses beyond the threshold against the previous round's committed
runs — the commit-time lock-in of the bench_diff adjudication discipline
(medians over >= 3 runs; single-run spikes are HOST-STALL verdicts, not
failures).

Usage:
    bench_gate.py <base_run_dir_or_files...> --vs <new_run_dir_or_files...>
                  [--ratio=1.5] [--min-sec=0.5] [--drift-ratio=1.25]
                  [--solo=<dir>] [--solo-base=<dir>]

DRIFT verdicts (median moved but not reproduced in >= half the runs,
or consistently elevated above --drift-ratio) FAIL the gate unless a
solo receipt adjudicates them: --solo = current-code solo run*.json of
the drifted queries; --solo-base = the same queries run solo with the
BASE code on the same box (worktree at the base commit) — the
same-code A/B that separates box drift from a code regression.

Directories expand to their *.json run files. Everything else — median
collapse, REGRESSION-reproduces vs HOST-STALL verdicts, contention
labels, the exit code — is bench_diff's median mode, invoked verbatim so
the gate can never drift from the adjudication tool.
"""
import glob
import os
import sys

import bench_diff


def expand(arg):
    if os.path.isdir(arg):
        # run dirs also hold non-run diagnostics (topk_grid.json):
        # prefer the run*.json convention, fall back to everything
        files = (sorted(glob.glob(os.path.join(arg, "run*.json")))
                 or sorted(glob.glob(os.path.join(arg, "*.json"))))
        if not files:
            raise SystemExit(f"{arg}: no *.json run files")
        return files
    return [arg]


def main():
    argv = sys.argv[1:]
    if "--vs" not in argv:
        raise SystemExit(__doc__)
    out = []
    for a in argv:
        if a.startswith("--") and a != "--vs":
            out.append(a)
        elif a == "--vs":
            out.append(a)
        else:
            out.extend(expand(a))
    if out.count("--vs") != 1 or out.index("--vs") == 0 or out[-1] == "--vs":
        raise SystemExit(__doc__)
    sys.argv = [sys.argv[0]] + out
    bench_diff.main()  # exits 1 only on reproduced regressions


if __name__ == "__main__":
    main()
