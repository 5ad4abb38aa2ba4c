#!/bin/bash
# Round-4 measurement battery — runs when the TPU tunnel is back.
# Priority order per VERDICT r4 #1: the verified bench number FIRST,
# then attribution + sweeps + kernel A/Bs, then a flipped-kernels bench.
# Appends to /tmp/r4_measure.log; re-runnable.  After every step the
# cleaned log is copied into the repo so the driver's end-of-round
# snapshot preserves partial results even if the battery is interrupted.
set -x
cd /root/repo
LOG=/tmp/r4_measure.log

persist() {
  grep -v "cpu_aot_loader\|machine feature" $LOG \
      > /root/repo/scratch/r4_measure_results.log 2>/dev/null \
      || cp $LOG /root/repo/scratch/r4_measure_results.log
}

echo "=== battery start $(date)" >> $LOG

echo "--- 1. full-study bench (the round's scoreboard number)" >> $LOG
timeout 5400 python bench.py --repeats 3 > /tmp/r4_bench_default.out 2>&1
cat /tmp/r4_bench_default.out >> $LOG
persist

echo "--- 1b. full-study bench with the EEG diagram bank (eeg_bank knob:" \
     "comparison reuses the features stage's per-window diagrams;" \
     "CPU-parity-pinned by tests/test_eeg_bank.py)" >> $LOG
TDA_TPU_EEG_BANK=1 timeout 5400 python bench.py --repeats 3 \
    > /tmp/r4_bench_bank.out 2>&1
cat /tmp/r4_bench_bank.out >> $LOG
python scratch/write_tuning.py --apply-bank >> $LOG 2>&1
persist

echo "--- 1c. full-study bench at eeg_batch=32 (the bank path's leaner" \
     "comparison program may now fit the remote compile helper; halves" \
     "the per-batch dispatch count if it compiles)" >> $LOG
TDA_TPU_EEG_BATCH=32 timeout 5400 python bench.py --repeats 3 \
    > /tmp/r4_bench_batch.out 2>&1
cat /tmp/r4_bench_batch.out >> $LOG
python scratch/write_tuning.py --apply-batch 32 >> $LOG 2>&1
persist

echo "--- 2. comparison attribution (current tree)" >> $LOG
timeout 3000 python scratch/cmp_attrib.py >> $LOG 2>&1
persist

echo "--- 3. backend crossover n in {48,64,80,96,124} (VERDICT #5)" >> $LOG
timeout 3000 python scratch/bench_crossover.py 512 > /tmp/r4_crossover.out 2>&1
cat /tmp/r4_crossover.out >> $LOG
python scratch/write_tuning.py --apply-crossover >> $LOG 2>&1
persist

echo "--- 4. EEG lockstep chunk sweep (VERDICT #1 iv)" >> $LOG
timeout 3000 python scratch/sweep_feature_chunks.py 96 \
    > /tmp/r4_chunks.out 2>&1
cat /tmp/r4_chunks.out >> $LOG
python scratch/write_tuning.py --apply-chunk >> $LOG 2>&1
persist

echo "--- 5. grouped-segmented kernel A/B at n=47 (the round-4 big lever)" >> $LOG
timeout 3000 python scratch/bench_grouped.py 1024 > /tmp/r4_grouped.out 2>&1
cat /tmp/r4_grouped.out >> $LOG
persist

echo "--- 6. multi-chain audio kernel A/B at n=124 (chains 1/2/4)" >> $LOG
timeout 3000 python scratch/bench_dual.py 512 > /tmp/r4_dual.out 2>&1
cat /tmp/r4_dual.out >> $LOG
persist

# flip only the kernels that WON at kernel level; then promote them into
# tuning.json iff the flipped full-study bench beats the default
CAND=$(python scratch/write_tuning.py --candidates)
if [ -n "$CAND" ]; then
  echo "--- 7. full-study bench with measured kernel winners: $CAND" >> $LOG
  # same repeat count as the default bench: min-of-N vs min-of-M on a
  # ±50%-variance worker would bias the promotion decision
  env $CAND timeout 5400 python bench.py --repeats 3 \
      > /tmp/r4_bench_flipped.out 2>&1
  cat /tmp/r4_bench_flipped.out >> $LOG
  python scratch/write_tuning.py --apply >> $LOG 2>&1
else
  echo "--- 7. skipped: no kernel candidate beat the defaults" >> $LOG
fi

echo "=== battery end $(date)" >> $LOG
persist
