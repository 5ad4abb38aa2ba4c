"""Turn the measurement battery's A/B outputs into tuning.json.

Modes, driven by scratch/measure_r5.sh (the round-4 grouped/multi-chain
kernel candidates are gone — those kernels never compiled on this
deployment's remote compile helper and were deleted in round 5):

  --apply-bank   promotion rule for the eeg_bank knob
                 (/tmp/r5_bench_bank.out vs the default bench): the
                 comparison stage reusing the features stage's diagrams
                 is CPU-parity-pinned (tests/test_eeg_bank.py), so the
                 gate is purely the end-to-end time — plus proof the run
                 actually served from the bank (bank_batches > 0).
  --apply-crossover  set pallas_min_n from the crossover sweep
                 (/tmp/r5_crossover.out): the smallest measured n from
                 which pallas wins at every measured size above it, with
                 bars-match=True at every measured size (both backends
                 are exact, so this knob is promoted on the kernel-level
                 sweep alone — misrouting costs speed, never results).
  --apply-chunk  set tda_chunk/feature_na_max from the features-stage
                 sweep (/tmp/r5_chunks.out): fastest rep-phase config,
                 promoted only if it beats the default (256, 128) config
                 in the same sweep AND matches its overflow count (extra
                 overflows mean extra exact-redo work the sweep's clock
                 doesn't see).
  --apply-batch  promotion rule for the eeg_batch knob
                 (/tmp/r5_bench_batch.out vs the best prior bench): the
                 recording-batch size cannot change results (one compiled
                 shape, padded batches — tests pin shard==monolith), so
                 the gate is again purely the end-to-end time.  The batch
                 bench runs AFTER --apply-bank, so tuning.json's bank
                 setting is already the measured winner.
"""
import argparse
import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
BENCH_DEFAULT = Path("/tmp/r5_bench_default.out")
BENCH_BANK = Path("/tmp/r5_bench_bank.out")
BENCH_BATCH = Path("/tmp/r5_bench_batch.out")
CROSSOVER_OUT = Path("/tmp/r5_crossover.out")
CHUNKS_OUT = Path("/tmp/r5_chunks.out")
TUNING = ROOT / "tda_eeg_audio_tpu" / "tuning.json"


def _merge_tuning(updates: dict):
    """Merge knobs into tuning.json, preserving knobs promoted by other
    battery steps (the bank and shape promotions are independent)."""
    try:
        data = json.loads(TUNING.read_text())
        if not isinstance(data, dict):
            data = {}
    except (OSError, ValueError):
        data = {}
    measured = {**data.get("measured", {}), **updates.pop("measured", {})}
    data.update(updates)
    data["measured"] = measured
    TUNING.write_text(json.dumps(data, indent=2) + "\n")
    return data


def _read(p: Path) -> str:
    try:
        return p.read_text()
    except OSError:
        return ""


def crossover_candidate():
    """Measured pallas_min_n, or None if the sweep is unusable.

    Requires bars-match=True on EVERY parsed row (an on-device mismatch
    at any size voids the sweep: exactness is the premise of promoting
    without an end-to-end bench) and a sane timing on every row — any
    side measured < 0.01 ms/win is a timing artifact (the r4 sweep's
    n=48 row read 0.000/0.000) and voids the sweep rather than feeding
    a promotion.  Returns the smallest measured n from which pallas wins
    at every measured size >= it; if pallas never wins, returns a
    sentinel above the largest measured size so nothing routes to
    pallas."""
    txt = _read(CROSSOVER_OUT)
    rows = [(int(n), float(tb), float(tp), w, bm)
            for n, tb, tp, w, bm in re.findall(
                r"n=\s*(\d+)\s+bitset\s+([\d.]+) ms/win\s+pallas\s+"
                r"([\d.]+) ms/win\s+winner=(\w+)\s+bars-match=(\w+)", txt)]
    if not rows:
        return None
    if any(bm != "True" for *_, bm in rows):
        return None
    if any(tb < 0.01 or tp < 0.01 for _, tb, tp, _, _ in rows):
        return None
    rows.sort()
    thr = rows[-1][0] + 1                     # pallas never wins
    for n, _, _, w, _ in reversed(rows):
        if w != "pallas":
            break
        thr = n
    return thr


def chunk_candidate():
    """Best (tda_chunk, feature_na_max) from the features-stage sweep, or
    None.  Uses rep-phase rows only (warm rows time compilation); per
    config keeps the MIN across reps (±50% worker variance); requires the
    winner's overflow count to equal the default config's and a win over
    the default's time."""
    txt = _read(CHUNKS_OUT)
    rows = re.findall(
        r"rep\d+: chunk=(\d+) na_max=(\d+)\s+([\d.]+)s\s+[\d.]+ ms/win\s+"
        r"ovf=(\d+)", txt)
    best = {}
    for c, na, t, ovf in rows:
        key = (int(c), int(na))
        cur = best.get(key)
        cand = (float(t), int(ovf))
        if cur is None or cand[0] < cur[0]:
            best[key] = cand
    default = best.get((256, 128))
    if not default or len(best) < 2:
        return None
    (c, na), (t, ovf) = min(best.items(), key=lambda kv: kv[1][0])
    if (c, na) == (256, 128) or t >= default[0] or ovf != default[1]:
        return None
    return dict(tda_chunk=c, feature_na_max=na, s=t, s_default=default[0])


def bench_record(p: Path):
    """Last full_study_seconds JSON line as a dict, or None."""
    for line in reversed(_read(p).splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if d.get("metric") == "full_study_seconds":
                return d
    return None


def bench_value(p: Path):
    d = bench_record(p)
    return d.get("value") if d else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply-bank", action="store_true")
    ap.add_argument("--apply-batch", type=int, default=None,
                    metavar="BATCH", help="promote eeg_batch=BATCH iff the "
                    "batch bench beat every prior bench")
    ap.add_argument("--apply-crossover", action="store_true")
    ap.add_argument("--apply-chunk", action="store_true")
    args = ap.parse_args()

    if args.apply_chunk:
        ch = chunk_candidate()
        if ch is None:
            print("write_tuning: no features-shape winner (or overflow "
                  "mismatch); tuning.json untouched")
            return
        _merge_tuning(dict(tda_chunk=ch["tda_chunk"],
                           feature_na_max=ch["feature_na_max"],
                           measured=dict(feature_sweep=ch)))
        print(f"write_tuning: WROTE tda_chunk={ch['tda_chunk']} "
              f"feature_na_max={ch['feature_na_max']} to {TUNING} "
              f"({ch['s']:.2f}s vs default {ch['s_default']:.2f}s)")
        return

    if args.apply_crossover:
        thr = crossover_candidate()
        if thr is None:
            print("write_tuning: crossover sweep unusable (missing rows, a "
                  "bars-match failure, or a degenerate timing); tuning.json "
                  "untouched")
            return
        _merge_tuning(dict(pallas_min_n=thr,
                           measured=dict(pallas_min_n=thr)))
        print(f"write_tuning: WROTE pallas_min_n={thr} to {TUNING}")
        return

    if args.apply_batch is not None:
        prior = [v for v in (bench_value(BENCH_DEFAULT),
                             bench_value(BENCH_BANK)) if v is not None]
        rec = bench_record(BENCH_BATCH)
        v_b = rec.get("value") if rec else None
        if v_b is None or rec.get("ok") is False:
            print(f"write_tuning: batch bench unusable (value={v_b}, "
                  f"ok={rec.get('ok') if rec else None}); tuning.json "
                  f"untouched")
            return
        tun = {}
        try:
            tun = json.loads(TUNING.read_text())
        except (OSError, ValueError):
            pass
        if (tun.get("eeg_bank")
                and not rec.get("detail", {}).get("bank_batches")):
            print("write_tuning: batch bench ran with eeg_bank promoted "
                  "but never served a bank batch; tuning.json untouched")
            return
        if prior and v_b >= min(prior):
            print(f"write_tuning: batch {v_b:.1f}s did not beat best prior "
                  f"{min(prior):.1f}s; tuning.json untouched")
            return
        _merge_tuning(dict(
            eeg_batch=args.apply_batch,
            measured=dict(full_study_batch_s=v_b,
                          full_study_batch=args.apply_batch)))
        print(f"write_tuning: WROTE eeg_batch={args.apply_batch} to "
              f"{TUNING} (batch {v_b:.1f}s vs prior {prior})")
        return

    if args.apply_bank:
        v_def = bench_value(BENCH_DEFAULT)
        rec = bench_record(BENCH_BANK)
        v_bank = rec.get("value") if rec else None
        if v_bank is None or rec.get("ok") is False:
            print(f"write_tuning: bank bench unusable (value={v_bank}, "
                  f"ok={rec.get('ok') if rec else None}); tuning.json "
                  f"untouched")
            return
        if not rec.get("detail", {}).get("bank_batches"):
            # the run fell back to the in-call path (or predates the
            # engagement counter): it measured the default, not the bank
            print("write_tuning: bank bench never served a batch from the "
                  "bank; tuning.json untouched")
            return
        if v_def is not None and v_bank >= v_def:
            print(f"write_tuning: bank {v_bank:.1f}s did not beat default "
                  f"{v_def:.1f}s; tuning.json untouched")
            return
        _merge_tuning(dict(
            eeg_bank=True,
            measured=dict(full_study_bank_s=v_bank,
                          full_study_default_s=v_def)))
        print(f"write_tuning: WROTE eeg_bank=true to {TUNING} "
              f"(bank {v_bank:.1f}s vs default {v_def}s)")
        return

    ap.error("pass one of --apply-bank/--apply-batch/--apply-crossover/"
             "--apply-chunk")


if __name__ == "__main__":
    main()
