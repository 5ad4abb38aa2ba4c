"""Benchmark: fused EEG TDA path (filter → window → corr → exact Rips H0+H1 →
features) on one chip, vs the native C++ host engine baseline.

Metric per BASELINE.json: "Windows/sec/chip: filter→Rips→features".
`vs_baseline` = device throughput / measured host-engine throughput on this
machine (a ripser-class exact C++ implementation using all host cores) —
the reference publishes no throughput numbers (BASELINE.md), so the live
host measurement is the honest stand-in for its CPU stack.

The device path is ONE jitted program per recording batch
(models/programs.py eeg_feature_program); synthetic EEG is generated on
device — on this deployment the host↔device link runs at ~10-35 MB/s with
~40 ms round-trip latency, so the bench measures compute, not the tunnel.

Prints ONE JSON line.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def _wait_for_backend(attempts: int = 4, backoff_s: float = 75.0,
                      probe_timeout_s: float = 240.0):
    """Block until a JAX backend initializes, retrying transient failures.

    This deployment's axon TPU tunnel has demonstrably gone down mid-round
    (BENCH_r03: rc=1, `Unable to initialize backend 'axon'`) and has also
    been observed to HANG on init for 10+ minutes; the bench is the round's
    only official measurement, so it must fight for its number.  Each
    attempt therefore probes in a SUBPROCESS with a hard timeout — a hung
    init cannot stall the parent — and only after a probe succeeds is the
    in-process backend initialized (at which point the tunnel is known
    up).  JAX caches a failed in-process init, so that is cleared before
    re-probing.  Returns the device list, or raises after all attempts.
    """
    import subprocess

    import jax

    last = "no attempts made"
    for attempt in range(attempts):
        if attempt:
            time.sleep(backoff_s)
            try:  # drop any cached in-process init failure
                from jax._src import xla_bridge
                xla_bridge._clear_backends()
            except Exception:
                pass
        if attempts > 1:  # multi-attempt mode = real-hardware mode: probe
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; print(len(jax.devices()))"],
                    capture_output=True, timeout=probe_timeout_s, text=True)
                if r.returncode != 0:
                    last = (r.stderr or r.stdout).strip()[-400:]
                    print(f"backend probe {attempt + 1}/{attempts} rc="
                          f"{r.returncode}: {last}", file=sys.stderr)
                    continue
            except subprocess.TimeoutExpired:
                last = f"backend probe hung > {probe_timeout_s:.0f}s"
                print(f"backend probe {attempt + 1}/{attempts}: {last}",
                      file=sys.stderr)
                continue
        try:
            devs = jax.devices()
            if devs:
                return devs
        except Exception as e:
            last = repr(e)
            print(f"backend init attempt {attempt + 1}/{attempts} failed: "
                  f"{e!r}", file=sys.stderr)
    raise RuntimeError(f"backend unavailable after {attempts} attempts: "
                       f"{last}")


def _emit(payload: dict) -> None:
    print(json.dumps(payload), flush=True)


def full_study(args) -> None:
    """North-star bench (BASELINE.json): the full study — per-recording
    features (1,416 × 5 bands, EEG Rips H0+H1), EEG↔audio comparison and
    matched/mismatched control (audio Takens diagrams + window-paired
    Wasserstein + Wilcoxon/sign-flip/FDR stats) — wall-clock on one chip.

    The host-sklearn RF/permutation stage is excluded: the target
    (BASELINE.json "full study < 60 s") covers diagrams, features and
    Wasserstein tests; the RF permutation fan-out is a host-core-count
    benchmark, not a TPU one (SURVEY §2.2).

    Every failure mode still prints ONE JSON line: backend init is retried
    with backoff, the dataset ingest lives inside the per-repeat try, and a
    total failure reports {"value": null, "error": ...} with rc=0 so the
    driver records something attributable (VERDICT r3 #2).
    """
    import dataclasses
    import tempfile
    import traceback

    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG
    from tda_eeg_audio_tpu.models.study import StudyRunner

    n_subj = 3 if args.smoke else 45
    per = 2 if args.smoke else 16
    cfg = dataclasses.replace(DEFAULT_CONFIG, wasserstein_backend="sinkhorn")
    runs, checks = [], {}
    ds = None
    t_ingest = None
    last_err = None
    backend_up = False
    with tempfile.TemporaryDirectory() as td:
        for rep in range(max(args.repeats, 1)):
            try:
                if ds is None:
                    # backend + HBM ingest inside the loop: a transient
                    # tunnel outage on attempt 1 must not kill the bench
                    # (6 × 120 s ≈ half an hour of fighting: the r3/r4 axon
                    # outages lasted hours, but shorter blips are common)
                    _wait_for_backend(attempts=1 if args.smoke else 6,
                                      backoff_s=120.0)
                    backend_up = True
                    import jax
                    from tda_eeg_audio_tpu.io.device_store import \
                        build_synthetic_device
                    # stage the dataset into HBM before the clock — the
                    # study reads device-resident slices (io.device_store),
                    # so the bench measures the pipeline, not the tunnel
                    t0 = time.time()
                    ds = build_synthetic_device(
                        n_subjects=n_subj, n_per_subject=per)
                    jax.block_until_ready((ds.eeg, ds.audio))
                    t_ingest = time.time() - t0
                    print(f"[bench] ingest done in {t_ingest:.1f}s",
                          file=sys.stderr, flush=True)
                # fresh runner per repeat (drops result caches); compiled
                # device programs persist, so repeat 2+ is the steady state
                # without per-process compile-cache deserialization.
                # eeg_batch default 16 = the validated fused-program batch
                # (larger batches grow the comparison program's footprint
                # and can OOM the remote compile helper); both shapes ride
                # tuning.py so the measurement battery can A/B and promote
                # alternatives end-to-end (TDA_TPU_EEG_BATCH/TDA_CHUNK)
                from tda_eeg_audio_tpu import tuning
                runner = StudyRunner(ds, cfg, eeg_batch=tuning.EEG_BATCH,
                                     tda_chunk=tuning.TDA_CHUNK,
                                     results_dir=td, verbose=False)
                t0 = time.time()
                X, y, subjects, filenames, meta = \
                    runner.compute_feature_dataset()
                t_feat = time.time() - t0
                print(f"[bench] rep {rep}: features {t_feat:.1f}s",
                      file=sys.stderr, flush=True)
                t1 = time.time()
                cmp_out = runner.run_comparison(n_permutations=1000)
                t_cmp = time.time() - t1
                print(f"[bench] rep {rep}: comparison {t_cmp:.1f}s",
                      file=sys.stderr, flush=True)
                t2 = time.time()
                ctl = runner.run_control()
                t_ctrl = time.time() - t2
                print(f"[bench] rep {rep}: control {t_ctrl:.1f}s "
                      f"(total {time.time() - t0:.1f}s)",
                      file=sys.stderr, flush=True)
            except Exception as e:
                # the shared worker's tunnel can drop mid-repeat; report
                # completed repeats rather than dying without a JSON line
                last_err = e
                traceback.print_exc(file=sys.stderr)
                print(f"repeat {rep} aborted; {len(runs)} completed "
                      f"repeat(s) so far", file=sys.stderr)
                if not backend_up:
                    break  # backend never came up — no point repeating
                # a transient failure AFTER the backend probe succeeded
                # (ingest blip, mid-repeat tunnel drop): retry on the
                # remaining repeats — ds stays None, so the next repeat
                # re-probes and re-ingests
                continue
            runs.append(dict(total=round(time.time() - t0, 1),
                             features_s=round(t_feat, 1),
                             compare_s=round(t_cmp, 1),
                             control_s=round(t_ctrl, 1),
                             # eeg_bank engagement (battery step 1b must
                             # see served > 0, else it benched a fallback)
                             bank_batches=getattr(runner, "_bank_served",
                                                  None),
                             bank_fallback=getattr(runner, "_bank_fallback",
                                                   None)))
            # sanity checks reported, not asserted — a degraded number with
            # ok=false beats aborting after minutes of compute
            checks = {"n_features_220": X.shape[1] == 220,
                      "rows_complete":
                          len(cmp_out["detailed_rows"]) >= len(ds) * 4,
                      "X_shape": list(X.shape)}
            # emit the FULL result line after EVERY completed repeat ("last
            # line wins"): the driver's bench runs under a hard timeout and
            # a SIGKILL mid-repeat must still leave a parseable number
            # (BENCH_r04.json was rc=124/parsed:null despite a completed
            # repeat — VERDICT r4 #2)
            _emit_full_study(runs, checks, len(ds), t_ingest, last_err,
                             pending_repeats=max(args.repeats, 1) - rep - 1)
    if not runs:
        _emit({"metric": "full_study_seconds", "value": None,
               "unit": "s (features + comparison + control, 5 bands, one chip)",
               "vs_baseline": None,
               "error": repr(last_err) if last_err else "no completed runs"})


def _emit_full_study(runs, checks, n_recordings, t_ingest, last_err,
                     pending_repeats=0) -> None:
    best = min(runs, key=lambda r: r["total"])
    # the headline is the best warm repeat (the worker's throughput varies
    # ±50% run-to-run); the median of all repeats is reported alongside so
    # the variance is on the record (run 1 of a fresh process additionally
    # pays compile-cache deserialization and is visible in `runs`)
    median = float(np.median([r["total"] for r in runs]))
    _emit({
        "metric": "full_study_seconds",
        "value": best["total"],
        "unit": "s (features + comparison + control, 5 bands, one chip)",
        "vs_baseline": (round(60.0 / best["total"], 3)
                        if best["total"] else None),
        "ok": all(v for v in checks.values() if isinstance(v, bool)),
        "detail": {"n_recordings": n_recordings, **best,
                   "median_total_s": round(median, 1),
                   "device_ingest_s": round(t_ingest, 1),
                   "runs": runs, "checks": checks,
                   "pending_repeats": pending_repeats,
                   "aborted_error": repr(last_err) if last_err else None},
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny run on CPU")
    ap.add_argument("--full-study", action="store_true",
                    help="north-star bench: full study wall clock (1,440 "
                         "synthetic recordings: features+compare+control). "
                         "DEFAULT when no mode flag is given.")
    ap.add_argument("--eeg-throughput", action="store_true",
                    help="EEG feature-slice micro-bench (windows/s)")
    ap.add_argument("--recordings", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--windows", type=int, default=40,
                    help="windows per band per recording (study-equalized ~39)")
    args = ap.parse_args()

    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    if args.smoke:
        from tda_eeg_audio_tpu.runtime import force_cpu
        force_cpu()
    # the headline metric (BASELINE.json north star) is the full-study wall
    # clock; the EEG micro-bench remains behind --eeg-throughput / --smoke
    if args.full_study or not (args.eeg_throughput or args.smoke):
        try:
            full_study(args)
        except BaseException as e:  # last-ditch: never exit without a line
            if isinstance(e, KeyboardInterrupt):
                raise
            print(json.dumps({"metric": "full_study_seconds", "value": None,
                              "vs_baseline": None, "error": repr(e)}))
        return

    import jax
    import jax.numpy as jnp
    from functools import partial
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG
    from tda_eeg_audio_tpu.models.programs import (eeg_feature_program,
                                                   eeg_distance_program)

    cfg = DEFAULT_CONFIG
    B = 8 if args.smoke else args.recordings
    K = 8 if args.smoke else args.windows
    T_PAD, N_WIN = 5800, 90
    CHUNK = 64 if args.smoke else 320
    C = 47

    @partial(jax.jit, static_argnames=("b",))
    def synth_eeg(key, b):
        """Band-mixture EEG on device: shared oscillators + channel noise."""
        t = jnp.arange(T_PAD) / cfg.fs_eeg
        k1, k2, k3 = jax.random.split(key, 3)
        freqs = jnp.asarray([2.0, 6.0, 10.5, 22.0, 41.0])
        phase = jax.random.uniform(k1, (b, 5, 1), maxval=2 * jnp.pi)
        amp = jax.random.uniform(k2, (b, 5, 1), minval=0.5, maxval=1.5)
        drive = jnp.sum(amp * jnp.sin(2 * jnp.pi * freqs[None, :, None]
                                      * t[None, None, :] + phase), axis=1)
        mix = jax.random.uniform(k3, (b, C, 1), minval=0.3, maxval=1.0)
        noise = jax.random.normal(jax.random.fold_in(key, 7), (b, C, T_PAD))
        return mix * drive[:, None, :] + 0.7 * noise

    key = jax.random.key(0)
    eeg = synth_eeg(key, B)
    ns = jnp.full((B,), T_PAD - 100, jnp.int32)
    n_win = int((T_PAD - 100 - cfg.win_samples) // cfg.step_samples + 1)
    rng = np.random.default_rng(0)
    use_idx = np.stack([
        rng.choice(n_win, size=K, replace=False)
        for _ in range(B * 5)]).reshape(B, 5, K).astype(np.int32)
    use_mask = np.ones((B, 5, K), bool)
    ui = jnp.asarray(use_idx)
    um = jnp.asarray(use_mask)

    def device_pass(k):
        e = synth_eeg(k, B)
        agg, _ = eeg_feature_program(e, ns, ui, um, cfg, N_WIN, K, chunk=CHUNK)
        return np.asarray(agg)

    t0 = time.time()
    device_pass(key)  # compile + warm
    warm = time.time() - t0
    times = []
    for i in range(args.repeats):
        t0 = time.time()
        device_pass(jax.random.fold_in(key, i + 1))
        times.append(time.time() - t0)
    n_windows = B * 5 * K
    dev_wps = n_windows / min(times)

    # host baseline: native C++ engine (exact, threaded) on the same windows
    from tda_eeg_audio_tpu.native.engine import rips_persistence_batch

    n_base = min(512, n_windows)
    dist, _, _ = eeg_distance_program(eeg, ns, cfg, N_WIN)
    sel = jnp.take_along_axis(
        dist, ui[:, :, :, None, None], axis=2).reshape(-1, C, C)[:n_base]
    dms = np.asarray(sel)  # small readback (~4.5 MB)
    rips_persistence_batch(dms[:64], cfg.max_edge_length)  # warm/build
    t0 = time.time()
    rips_persistence_batch(dms, cfg.max_edge_length)
    host_wps = n_base / (time.time() - t0)

    print(json.dumps({
        "metric": "eeg_windows_per_sec_per_chip",
        "value": round(dev_wps, 1),
        "unit": "windows/s (filter->window->corr->exact Rips H0+H1->features)",
        "vs_baseline": round(dev_wps / host_wps, 3),
        "detail": {"batch": B, "K": K, "warm_s": round(warm, 1),
                   "host_wps": round(host_wps, 1)},
    }))


if __name__ == "__main__":
    main()
