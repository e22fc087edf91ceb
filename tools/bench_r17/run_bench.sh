#!/bin/bash
cd /root/repo
for i in 1 2 3; do
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' > /root/repo/tools/bench_r17/run$i.json
  echo "run$i done $(date +%H:%M:%S)" >> /root/repo/tools/bench_r17/progress.txt
done
echo ALLDONE >> /root/repo/tools/bench_r17/progress.txt
