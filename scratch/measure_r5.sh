#!/bin/bash
# Round-5 measurement battery.  Priority order: the scoreboard number
# FIRST (the round-5 tree carries the resample rewrite — the r5 big
# lever), then the union-bank A/B, batch 32, attribution, and the
# hardened crossover/chunk sweeps.  Appends to /tmp/r5_measure.log;
# re-runnable.  After every step the cleaned log is copied into the repo
# so the driver's end-of-round snapshot preserves partial results even if
# the battery is interrupted.
set -x
cd /root/repo
LOG=/tmp/r5_measure.log

persist() {
  grep -v "cpu_aot_loader\|machine feature" $LOG \
      > /root/repo/scratch/r5_measure_results.log 2>/dev/null \
      || cp $LOG /root/repo/scratch/r5_measure_results.log
}

echo "=== battery start $(date)" >> $LOG

echo "--- 1. full-study bench (the round's scoreboard number; bench.py" \
     "now emits its JSON line after EVERY repeat — last line wins)" >> $LOG
timeout 5400 python bench.py --repeats 3 > /tmp/r5_bench_default.out 2>&1
cat /tmp/r5_bench_default.out >> $LOG
persist

echo "--- 2. full-study bench with the EEG UNION bank (eeg_bank knob:" \
     "comparison gathers the features stage's per-window diagrams via" \
     "K_CMP union columns; parity-pinned by tests/test_eeg_bank.py)" >> $LOG
TDA_TPU_EEG_BANK=1 timeout 5400 python bench.py --repeats 3 \
    > /tmp/r5_bench_bank.out 2>&1
cat /tmp/r5_bench_bank.out >> $LOG
python scratch/write_tuning.py --apply-bank >> $LOG 2>&1
persist

echo "--- 3. full-study bench at eeg_batch=32" >> $LOG
TDA_TPU_EEG_BATCH=32 timeout 5400 python bench.py --repeats 3 \
    > /tmp/r5_bench_batch.out 2>&1
cat /tmp/r5_bench_batch.out >> $LOG
python scratch/write_tuning.py --apply-batch 32 >> $LOG 2>&1
persist

echo "--- 4. comparison attribution (post-resample-rewrite shares)" >> $LOG
timeout 3000 python scratch/cmp_attrib.py >> $LOG 2>&1
persist

echo "--- 5. audio takens sub-attribution (resample rewrite verification)" >> $LOG
timeout 3000 python scratch/takens_attrib.py >> $LOG 2>&1
persist

echo "--- 6. backend crossover n in {48,64,80,96,124} (hardened gate:" \
     "a <0.01 ms/win row voids the sweep)" >> $LOG
timeout 3000 python scratch/bench_crossover.py 512 > /tmp/r5_crossover.out 2>&1
cat /tmp/r5_crossover.out >> $LOG
python scratch/write_tuning.py --apply-crossover >> $LOG 2>&1
persist

echo "--- 7. EEG lockstep chunk sweep" >> $LOG
timeout 3000 python scratch/sweep_feature_chunks.py 96 \
    > /tmp/r5_chunks.out 2>&1
cat /tmp/r5_chunks.out >> $LOG
python scratch/write_tuning.py --apply-chunk >> $LOG 2>&1
persist

echo "--- 8. final full-study bench at the promoted tuning (scoreboard" \
     "candidate if it beats step 1)" >> $LOG
timeout 5400 python bench.py --repeats 3 > /tmp/r5_bench_final.out 2>&1
cat /tmp/r5_bench_final.out >> $LOG
persist

echo "=== battery end $(date)" >> $LOG
persist
