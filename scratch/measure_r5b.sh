#!/bin/bash
# Round-5 battery, part 2: resumes measure_r5.sh from step 3 (the first
# battery run completed steps 1-2 — default 98.1 s, bank 82.7 s, eeg_bank
# promoted — then died with the session that launched it).  Appends to the
# same log; re-runnable.
set -x
cd /root/repo
LOG=/tmp/r5_measure.log

persist() {
  grep -v "cpu_aot_loader\|machine feature" $LOG \
      > /root/repo/scratch/r5_measure_results.log 2>/dev/null \
      || cp $LOG /root/repo/scratch/r5_measure_results.log
}

echo "=== battery part 2 start $(date)" >> $LOG

echo "--- 3. full-study bench at eeg_batch=32 (on top of the promoted" \
     "eeg_bank=true tuning)" >> $LOG
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
     "candidate if it beats step 2's 82.7 s)" >> $LOG
timeout 5400 python bench.py --repeats 3 > /tmp/r5_bench_final.out 2>&1
cat /tmp/r5_bench_final.out >> $LOG
persist

echo "=== battery part 2 end $(date)" >> $LOG
persist
