#!/bin/bash
# Round-5 battery, part 3: post-promotion probes at the new default tuning
# (eeg_bank=true, eeg_batch=32, tda_chunk=64, feature_na_max=64).
# Targets, from the step-4 attribution of the 43.8 s comparison stage:
# stats 6.8 s (implausibly fat — isolate), features lockstep divergence
# (sorted-by-n_na A/B), eeg_batch=64, tda_chunk=32.
set -x
cd /root/repo
LOG=/tmp/r5_measure.log

persist() {
  grep -v "cpu_aot_loader\|machine feature" $LOG \
      > /root/repo/scratch/r5_measure_results.log 2>/dev/null \
      || cp $LOG /root/repo/scratch/r5_measure_results.log
}

echo "=== battery part 3 start $(date)" >> $LOG

echo "--- 9. stats program isolation (B=32 and B=16)" >> $LOG
timeout 1800 python scratch/probe_stats.py 32 >> $LOG 2>&1
timeout 1800 python scratch/probe_stats.py 16 >> $LOG 2>&1
persist

echo "--- 10. lockstep window sorting by n_na (features divergence A/B)" >> $LOG
timeout 2400 python scratch/ab_sorted_lockstep.py >> $LOG 2>&1
persist

echo "--- 11. full-study bench at eeg_batch=64" >> $LOG
TDA_TPU_EEG_BATCH=64 timeout 5400 python bench.py --repeats 2 \
    > /tmp/r5_bench_batch64.out 2>&1
cat /tmp/r5_bench_batch64.out >> $LOG
# promote only if it beats the step-8 final bench at batch 32
python - >> $LOG 2>&1 <<'EOF'
import json, sys
sys.path.insert(0, "/root/repo/scratch")
from pathlib import Path
from write_tuning import bench_record, _merge_tuning
b64 = bench_record(Path("/tmp/r5_bench_batch64.out"))
b32 = bench_record(Path("/tmp/r5_bench_final.out"))
if not b64 or b64.get("ok") is False:
    print("r5c: batch64 bench unusable; tuning untouched")
elif not b64["detail"].get("bank_batches"):
    print("r5c: batch64 never served the bank; tuning untouched")
elif b32 and b64["value"] >= b32["value"]:
    print(f"r5c: batch64 {b64['value']}s did not beat batch32 "
          f"{b32['value']}s; tuning untouched")
else:
    _merge_tuning(dict(eeg_batch=64,
                       measured=dict(full_study_batch_s=b64["value"],
                                     full_study_batch=64)))
    print(f"r5c: WROTE eeg_batch=64 ({b64['value']}s vs batch32 "
          f"{b32['value'] if b32 else None}s)")
EOF
persist

echo "--- 12. full-study bench at tda_chunk=32" >> $LOG
TDA_TPU_TDA_CHUNK=32 timeout 5400 python bench.py --repeats 2 \
    > /tmp/r5_bench_chunk32.out 2>&1
cat /tmp/r5_bench_chunk32.out >> $LOG
persist

echo "=== battery part 3 end $(date)" >> $LOG
persist
