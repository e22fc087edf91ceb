#!/bin/bash
# r19 standing-protocol gate, same-day INTERLEAVED, on FINAL code:
#   base = r18-final worktree rebuild (/tmp/base_r18 at 0edb6e0),
#   new  = r19 final code (full suite),
#   sub  = r19 final code, SPARK_GRAFT_BENCH_ONLY = the 169 r14-era
#          queries (full list minus q171/q172) — the item-4 drift cell:
#          same window, same code, only the two r15-added twins absent.
# 3 triplets. vmstat logging throughout. GATE_final.txt written after.
set -u
OUT=/root/repo/tools/bench_r19
SUB=$(cat /tmp/bench_only_169.txt)
mkdir -p "$OUT/base_r18_today" "$OUT/final" "$OUT/sub169"
for i in 1 2 3; do
  ( cd /tmp/base_r18 && SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' \
      > "$OUT/base_r18_today/run$i.json" )
  echo "base run$i done $(date +%H:%M:%S)" >> "$OUT/progress.txt"
  ( cd /root/repo && SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' \
      > "$OUT/final/run$i.json" )
  echo "new  run$i done $(date +%H:%M:%S)" >> "$OUT/progress.txt"
  ( cd /root/repo && SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_BENCH_ONLY="$SUB" \
      sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' \
      > "$OUT/sub169/run$i.json" )
  echo "sub  run$i done $(date +%H:%M:%S)" >> "$OUT/progress.txt"
done
echo GATEDONE >> "$OUT/progress.txt"
