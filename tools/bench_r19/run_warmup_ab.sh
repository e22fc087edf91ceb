#!/bin/bash
# r19 warmup on/off A/B (VERDICT r18 item 2): SAME binary, same window,
# interleaved 3v3, toggled by SPARK_GRAFT_BENCH_WARMUP. The "on" runs
# double as the round's before-window baseline (engine code identical to
# r18 final at this point). vmstat already logging.
set -u
OUT=/root/repo/tools/bench_r19
mkdir -p "$OUT/before" "$OUT/warmup_off"
cd /root/repo
for i in 1 2 3; do
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_WARMUP=1 \
    sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' \
    > "$OUT/before/run$i.json"
  echo "on  run$i done $(date +%H:%M:%S)" >> "$OUT/progress.txt"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_WARMUP=0 \
    sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' \
    > "$OUT/warmup_off/run$i.json"
  echo "off run$i done $(date +%H:%M:%S)" >> "$OUT/progress.txt"
done
echo ABDONE >> "$OUT/progress.txt"
