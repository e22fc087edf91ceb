#!/bin/bash
# r18 standing-protocol gate: same-day same-code A/B, INTERLEAVED
# (base = r17-final worktree rebuild, new = r18 final code), 3 runs
# each, vmstat already logging. GATE_final.txt is written by the
# builder AFTER this completes (never snapshot before it exists —
# the r17 process defect this round repays).
set -u
OUT=/root/repo/tools/bench_r18
BASE_WT=/tmp/base_r17
for i in 1 2 3; do
  ( cd "$BASE_WT" && SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' \
      > "$OUT/base_r17_today/run$i.json" )
  echo "base run$i done $(date +%H:%M:%S)" >> "$OUT/progress.txt"
  ( cd /root/repo && SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' \
      > "$OUT/run$i.json" )
  echo "new run$i done $(date +%H:%M:%S)" >> "$OUT/progress.txt"
done
echo ALLDONE >> "$OUT/progress.txt"
