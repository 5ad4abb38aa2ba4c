#!/bin/bash
# Round-5 battery, part 4: back-to-back eeg_batch 32-vs-64 tie-break in one
# tunnel window (the separate benches straddled a variance swing: 74.9 vs
# 81.9 at 32, 80.9 at 64), plus the winner x chunk decision.  All shapes are
# compile-cached by parts 2-3, so each bench is ~8-10 min.
set -x
cd /root/repo
LOG=/tmp/r5_measure.log

persist() {
  grep -v "cpu_aot_loader\|machine feature" $LOG \
      > /root/repo/scratch/r5_measure_results.log 2>/dev/null \
      || cp $LOG /root/repo/scratch/r5_measure_results.log
}

echo "=== battery part 4 start $(date)" >> $LOG

echo "--- 13. tie-break bench A: eeg_batch=32 (warm)" >> $LOG
TDA_TPU_EEG_BATCH=32 timeout 3600 python bench.py --repeats 2 \
    > /tmp/r5_tie32.out 2>&1
tail -4 /tmp/r5_tie32.out >> $LOG
persist

echo "--- 14. tie-break bench B: eeg_batch=64 (warm, same window)" >> $LOG
TDA_TPU_EEG_BATCH=64 timeout 3600 python bench.py --repeats 2 \
    > /tmp/r5_tie64.out 2>&1
tail -4 /tmp/r5_tie64.out >> $LOG
persist

python - >> $LOG 2>&1 <<'EOF'
import sys
sys.path.insert(0, "/root/repo/scratch")
from pathlib import Path
from write_tuning import bench_record, _merge_tuning
a = bench_record(Path("/tmp/r5_tie32.out"))
b = bench_record(Path("/tmp/r5_tie64.out"))
va = a["value"] if a and a.get("ok") else None
vb = b["value"] if b and b.get("ok") else None
print(f"r5d tie-break: batch32={va}s batch64={vb}s")
if va is None and vb is None:
    print("r5d: both unusable; tuning untouched")
elif vb is None or (va is not None and va <= vb):
    _merge_tuning(dict(eeg_batch=32,
                       measured=dict(full_study_batch_s=va,
                                     full_study_batch=32)))
    print(f"r5d: WROTE eeg_batch=32 ({va}s <= {vb}s)")
else:
    _merge_tuning(dict(eeg_batch=64,
                       measured=dict(full_study_batch_s=vb,
                                     full_study_batch=64)))
    print(f"r5d: WROTE eeg_batch=64 ({vb}s < {va}s)")
EOF
persist

echo "=== battery part 4 end $(date)" >> $LOG
persist
