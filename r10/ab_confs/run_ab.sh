#!/bin/bash
# Interleaved A/B: arm A = r09 tuned confs (session defaults: 16k/64k),
# arm B = Spark defaults (1m/4m). Fresh JVM per run, full registry,
# BENCH_DETAIL.json restored after each run so the committed profile is
# not clobbered by experiment arms.
cd /root/repo
for i in 1 2 3; do
  for arm in A B; do
    if [ "$arm" = A ]; then
      unset SPARK_GRAFT_AQE_MIN_PARTITION SPARK_GRAFT_OPEN_COST
    else
      export SPARK_GRAFT_AQE_MIN_PARTITION=1m SPARK_GRAFT_OPEN_COST=4m
    fi
    echo "=== run $i arm $arm $(date +%T) ===" >> r10/ab_confs/log.txt
    python bench.py 2> r10/ab_confs/stderr_${arm}${i}.txt > r10/ab_confs/stdout_${arm}${i}.txt
    echo "rc=$?" >> r10/ab_confs/log.txt
    git checkout -- BENCH_DETAIL.json 2>/dev/null
  done
done
echo DONE >> r10/ab_confs/log.txt
