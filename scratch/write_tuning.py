"""Turn the r4 measurement battery's kernel A/Bs into tuning.json.

Two modes, both driven by scratch/measure_r4.sh:

  --candidates   parse the kernel-level A/B outputs (/tmp/r4_grouped.out,
                 /tmp/r4_dual.out) and print env-var assignments for the
                 configurations that BEAT the production defaults at the
                 kernel level (empty output = nothing won, skip the
                 flipped bench).
  --apply        parse the default and flipped full-study bench outputs
                 (/tmp/r4_bench_default.out, /tmp/r4_bench_flipped.out);
                 merge the candidate knobs into tda_eeg_audio_tpu/
                 tuning.json ONLY if the flipped full-study number beats
                 the default end-to-end (or the default produced no
                 number).
  --apply-bank   same promotion rule for the eeg_bank knob
                 (/tmp/r4_bench_bank.out vs the default bench): the
                 comparison stage reusing the features stage's diagrams
                 is CPU-parity-pinned (tests/test_eeg_bank.py), so the
                 gate is purely the end-to-end time.
  --apply-crossover  set pallas_min_n from the crossover sweep
                 (/tmp/r4_crossover.out): the smallest measured n from
                 which pallas wins at every measured size above it, with
                 bars-match=True at every measured size (both backends
                 are exact, so this knob is promoted on the kernel-level
                 sweep alone — misrouting costs speed, never results).
  --apply-chunk  set tda_chunk/feature_na_max from the features-stage
                 sweep (/tmp/r4_chunks.out): fastest rep-phase config,
                 promoted only if it beats the default (256, 128) config
                 in the same sweep AND matches its overflow count (extra
                 overflows mean extra exact-redo work the sweep's clock
                 doesn't see).
  --apply-batch  promotion rule for the eeg_batch knob
                 (/tmp/r4_bench_batch.out vs the best prior bench): the
                 recording-batch size cannot change results (one compiled
                 shape, padded batches — tests pin shard==monolith), so
                 the gate is again purely the end-to-end time.  The batch
                 bench runs AFTER --apply-bank, so tuning.json's bank
                 setting is already the measured winner.

Validity gates: a grouped config must not add > 2% overflow windows vs
the lockstep (overflows reroute through the exact redo path — correct but
slow) and must report mism=0 per-window ON-DEVICE diagram parity vs the
lockstep (interpret-mode tests cannot catch a Mosaic miscompile); a
multi-chain config must reproduce chains=1's bar count exactly and report
mism=0 vs chains=1.
"""
import argparse
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
GROUPED_OUT = Path("/tmp/r4_grouped.out")
DUAL_OUT = Path("/tmp/r4_dual.out")
BENCH_DEFAULT = Path("/tmp/r4_bench_default.out")
BENCH_FLIPPED = Path("/tmp/r4_bench_flipped.out")
BENCH_BANK = Path("/tmp/r4_bench_bank.out")
BENCH_BATCH = Path("/tmp/r4_bench_batch.out")
CROSSOVER_OUT = Path("/tmp/r4_crossover.out")
CHUNKS_OUT = Path("/tmp/r4_chunks.out")
TUNING = ROOT / "tda_eeg_audio_tpu" / "tuning.json"


def _merge_tuning(updates: dict):
    """Merge knobs into tuning.json, preserving knobs promoted by other
    battery steps (the bank and kernel promotions are independent)."""
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


def grouped_candidate():
    """Best (group, na_max) grouped config iff it beats the XLA lockstep."""
    txt = _read(GROUPED_OUT)
    m = re.search(r"(\d+) study-shaped windows", txt)
    nw = int(m.group(1)) if m else 1024
    lock = [(float(t), int(ovf)) for t, ovf in re.findall(
        r"xla lockstep\s+chunk=\s*\d+\s+([\d.]+) ms/win.*?ovf=(\d+)", txt)]
    grp = [(float(t), int(g), int(na), int(ovf), int(mm))
           for g, na, t, ovf, mm in
           re.findall(r"grouped\s+g=\s*(\d+) na_max=\s*(\d+)\s+([\d.]+)"
                      r" ms/win.*?ovf=(\d+) mism=(\d+)", txt)]
    if not lock or not grp:
        return None
    t_lock, ovf_lock = min(lock)
    # gates: bounded extra overflow AND exact on-device diagram parity with
    # the lockstep on every non-overflow window
    ok = [c for c in grp
          if c[3] <= ovf_lock + max(2, nw // 50) and c[4] == 0]
    if not ok:
        return None
    t_g, g, na, _, _ = min(ok)
    if t_g >= t_lock:
        return None
    return dict(group=g, na_max=na, ms_grouped=t_g, ms_lockstep=t_lock)


def chains_candidate():
    """Fastest chain count iff a multi-chain config beats chains=1 with
    identical bar counts."""
    txt = _read(DUAL_OUT)
    runs = [(int(c), float(t), int(bars), int(mm))
            for c, t, bars, mm in re.findall(
                r"^chains=(\d+)\s+([\d.]+) ms/win.*?bars=(\d+) mism=(\d+)",
                txt, re.M)]
    base = [r for r in runs if r[0] == 1]
    if not base:
        return None
    _, t1, bars1, _ = base[0]
    ok = [(t, c) for c, t, bars, mm in runs
          if c > 1 and bars == bars1 and mm == 0]
    if not ok:
        return None
    t_best, c_best = min(ok)
    if t_best >= t1:
        return None
    return dict(chains=c_best, ms=t_best, ms_single=t1)


def crossover_candidate():
    """Measured pallas_min_n, or None if the sweep is unusable.

    Requires bars-match=True on EVERY parsed row (an on-device mismatch
    at any size voids the sweep: exactness is the premise of promoting
    without an end-to-end bench).  Returns the smallest measured n from
    which pallas wins at every measured size >= it; if pallas never wins,
    returns a sentinel above the largest measured size so nothing routes
    to pallas."""
    txt = _read(CROSSOVER_OUT)
    rows = [(int(n), w, bm) for n, w, bm in re.findall(
        r"n=\s*(\d+)\s+bitset\s+[\d.]+ ms/win\s+pallas\s+[\d.]+ ms/win\s+"
        r"winner=(\w+)\s+bars-match=(\w+)", txt)]
    if not rows:
        return None
    if any(bm != "True" for _, _, bm in rows):
        return None
    rows.sort()
    thr = rows[-1][0] + 1                     # pallas never wins
    for n, w, _ in reversed(rows):
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
    ap.add_argument("--candidates", action="store_true")
    ap.add_argument("--apply", action="store_true")
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
            print("write_tuning: crossover sweep unusable (missing rows or "
                  "a bars-match failure); tuning.json untouched")
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
    g = grouped_candidate()
    c = chains_candidate()

    if args.candidates:
        # the flipped full-study bench must run the EXACT winning shape,
        # not the module defaults — emit every knob the winner pins
        parts = []
        if g:
            parts.append("TDA_TPU_EEG_KERNEL=grouped")
            parts.append(f"TDA_TPU_GROUPED_SIZE={g['group']}")
            parts.append(f"TDA_TPU_GROUPED_NA_MAX={g['na_max']}")
        if c:
            parts.append(f"TDA_TPU_AUDIO_CHAINS={c['chains']}")
        print(" ".join(parts))
        return

    if args.apply:
        if not (g or c):
            print("write_tuning: no kernel-level winner; tuning.json untouched")
            return
        v_def = bench_value(BENCH_DEFAULT)
        flip = bench_record(BENCH_FLIPPED)
        v_flip = flip.get("value") if flip else None
        if v_flip is None:
            print(f"write_tuning: flipped bench has no number "
                  f"(default={v_def}); tuning.json untouched")
            return
        if flip.get("ok") is False:
            # bench.py reports degraded runs (wrong feature width,
            # incomplete rows) as ok=false instead of asserting — a fast
            # number from a degraded run must never promote a kernel
            print(f"write_tuning: flipped bench reported ok=false "
                  f"(checks={flip.get('detail', {}).get('checks')}); "
                  f"tuning.json untouched")
            return
        if v_def is not None and v_flip >= v_def:
            print(f"write_tuning: flipped {v_flip:.1f}s did not beat "
                  f"default {v_def:.1f}s; tuning.json untouched")
            return
        updates = dict(
            eeg_small_kernel="grouped" if g else "bitset",
            audio_chains=c["chains"] if c else 1,
            measured=dict(kernel_ab=dict(grouped=g, chains=c),
                          full_study_default_s=v_def,
                          full_study_flipped_s=v_flip,
                          source="scratch/measure_r4.sh battery"))
        if g:
            updates["grouped_size"] = g["group"]
            updates["grouped_na_max"] = g["na_max"]
        data = _merge_tuning(updates)
        print(f"write_tuning: WROTE {TUNING} "
              f"(flipped {v_flip:.1f}s vs default {v_def}s): "
              f"{json.dumps({k: v for k, v in data.items() if k != 'measured'})}")
        return

    ap.error("pass --candidates or --apply")


if __name__ == "__main__":
    main()
