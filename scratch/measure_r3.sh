#!/bin/bash
# Round-3 measurement battery — run when the TPU tunnel is back.
# Each step appends to /tmp/r3_measure.log; safe to re-run.
set -x
cd /root/repo
LOG=/tmp/r3_measure.log
echo "=== battery start $(date)" >> $LOG

echo "--- 1. pallas kernel A/B (new app-tile kernel, n=124 + n=47)" >> $LOG
timeout 3000 python scratch/bench_pallas_h1.py --recordings 16 --skip-xla \
    >> $LOG 2>&1

echo "--- 2. feature-stage chunk/na_max sweep" >> $LOG
timeout 3000 python scratch/sweep_feature_chunks.py 96 >> $LOG 2>&1

echo "--- 3. comparison attribution" >> $LOG
timeout 3000 python scratch/cmp_attrib.py >> $LOG 2>&1

echo "--- 4. full-study bench" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1

echo "=== battery end $(date)" >> $LOG
