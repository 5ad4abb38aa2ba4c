"""CLI mirroring the reference entry points (SURVEY §7 item 9).

Commands map to the reference scripts:
  preprocess — banded windows      (notebooks/1_preprocesamiento.ipynb cell 3)
  graphs     — distance matrices   (notebooks/2_graph_construction.ipynb cell 8)
  features   — feature export      (scripts/tda_eeg_classification_v2.py front half)
  classify   — classification      (scripts/classification_rerun.py)
  ablate     — per-band ablation   (results/gamma_investigation.json generator)
  compare    — EEG↔audio comparison (scripts/tda_eeg_audio_comparison.py)
  control    — matched/mismatched  (scripts/matched_vs_mismatched.py)
  eda        — dataset inventory/PSD (notebooks/0_eda.ipynb)
  study      — features+classify+compare+control
Artifacts use the reference's JSON/CSV schemas for drop-in diffing.

Batch sharding (reference tda_eeg_classification_v2.py:54-60,608-668): the
env vars BATCH_START / BATCH_END / WRITE_PARTIAL / MERGE_PARTIALS — or the
equivalent flags — shard the features stage across independent invocations
with .npz partials merged by `--merge-partials`.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from . import tuning


def _build_runner(args):
    from .runtime import enable_compilation_cache, force_cpu, init_distributed

    enable_compilation_cache()
    if args.device == "cpu":
        force_cpu()
    # multi-host: spans "dp" over DCN; a no-op single-process unless
    # --coordinator/--num-processes (or JAX_* env vars) are set
    info = init_distributed(args.coordinator, args.num_processes,
                            args.process_id)
    if info["num_processes"] > 1:
        print(f"distributed: process {info['process_id']}/"
              f"{info['num_processes']}, {info['local_devices']} local / "
              f"{info['devices']} global devices")
    import dataclasses

    from .config import DEFAULT_CONFIG
    from .models.study import StudyRunner

    cfg = DEFAULT_CONFIG
    if getattr(args, "wasserstein", None):
        cfg = dataclasses.replace(
            cfg, wasserstein_backend=(
                "sinkhorn" if args.wasserstein == "sinkhorn" else "host_exact"))

    if args.data:
        from .io.matfiles import MatDataset

        ds = MatDataset(args.data)
    else:
        from .io.synthetic import SynthDataset

        ds = SynthDataset(n_subjects=args.subjects,
                          n_per_subject=args.per_subject)
    # HBM-resident ingest: stage the dataset into device memory once so
    # multi-stage commands (study) never re-cross the host<->device link
    # (io/device_store.py).  Default on for the TPU; --no-store opts out
    # (e.g. datasets larger than HBM).
    use_store = args.store if args.store is not None         else (args.device == "tpu")
    if use_store:
        import jax

        from .config import GOOD_ELECTRODES
        from .io.device_store import build_from_dataset

        store = build_from_dataset(ds, GOOD_ELECTRODES, verbose=True)
        store.index = ds.index
        jax.block_until_ready((store.eeg, store.audio))
        ds = store
    return StudyRunner(ds, cfg, eeg_batch=args.batch,
                       tda_chunk=args.chunk, results_dir=args.results,
                       backend=args.backend,
                       mesh=("auto" if args.mesh == "auto" else None))


def main(argv=None) -> int:
    import os

    ap = argparse.ArgumentParser(prog="tda-eeg-audio-tpu")
    ap.add_argument("command", choices=["preprocess", "graphs", "features",
                                        "classify", "ablate", "compare",
                                        "control", "eda", "study"])
    ap.add_argument("--data", default=None,
                    help=".mat data root (data/slow, data/fast); default: synthetic")
    ap.add_argument("--store", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="stage the dataset into device HBM once "
                         "(default: on for TPU, off for CPU)")
    ap.add_argument("--subjects", type=int, default=45)
    ap.add_argument("--per-subject", type=int, default=16)
    ap.add_argument("--results", default="results")
    ap.add_argument("--out", default=None,
                    help="artifact dir for preprocess/graphs stages")
    # defaults ride tuning.py (measured by the on-hardware battery)
    ap.add_argument("--batch", type=int, default=tuning.EEG_BATCH)
    ap.add_argument("--chunk", type=int, default=tuning.TDA_CHUNK)
    ap.add_argument("--device", choices=["tpu", "cpu"], default="tpu")
    # multi-host (jax.distributed); default to JAX_* env vars
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port for multi-host runs")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--mesh", choices=["auto", "off"], default="auto",
                    help="auto (default): dp-shard the fused study programs "
                         "over all local TPU chips; off = one device")
    ap.add_argument("--backend", choices=["auto", "device", "pallas", "host"],
                    default=None,
                    help="homology backend (default: auto — Pallas kernel "
                         "for audio-sized clouds on TPU, XLA bitset else)")
    ap.add_argument("--wasserstein", choices=["exact", "sinkhorn"],
                    default=None,
                    help="sinkhorn (default) = fused on-device OT (the "
                         "benchmarked throughput path); exact = host JV "
                         "engine (parity, much slower)")
    ap.add_argument("--permutations", type=int, default=None)
    ap.add_argument("--bootstrap", type=int, default=None)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace + stage timings to DIR")
    ap.add_argument("--log", default=None, metavar="FILE",
                    help="structured JSON-lines event log (also via "
                         "TDA_TPU_LOG env var)")
    # job-level sharding (reference BATCH_START/BATCH_END/WRITE_PARTIAL/
    # MERGE_PARTIALS env vars, tda_eeg_classification_v2.py:54-60,608-668)
    ap.add_argument("--batch-start", type=int,
                    default=int(os.environ.get("BATCH_START", -1)))
    ap.add_argument("--batch-end", type=int,
                    default=int(os.environ.get("BATCH_END", -1)))
    ap.add_argument("--write-partial", action="store_true",
                    default=os.environ.get("WRITE_PARTIAL", "0") == "1")
    ap.add_argument("--merge-partials", action="store_true",
                    default=os.environ.get("MERGE_PARTIALS", "0") == "1")
    args = ap.parse_args(argv)

    if args.log:
        from .utils import logging as tlog
        tlog.configure(args.log)

    out_dir = Path(args.results)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.command == "features" and args.merge_partials:
        # pure file work (reference MERGE_PARTIALS,
        # tda_eeg_classification_v2.py:608-668) — never build a runner or
        # touch a device for it: the merge typically runs on a login node
        # after the per-process feature jobs
        _merge_partials(out_dir)
        return 0
    runner = _build_runner(args)

    from .utils.logging import LOGGER
    from .utils.profiling import device_trace, GLOBAL_TIMES

    import time as _time
    t0 = _time.time()
    LOGGER.event("command_start", command=args.command,
                 n_recordings=len(runner.ds))
    with device_trace(args.profile):
        with GLOBAL_TIMES.stage(args.command):
            rc = _dispatch(args, runner, out_dir)
    LOGGER.stage(args.command, _time.time() - t0)
    if args.profile:
        GLOBAL_TIMES.dump(Path(args.profile) / "stage_times.json")
    return rc


def _dispatch(args, runner, out_dir: Path) -> int:
    if args.command == "preprocess":
        rows = runner.write_preprocessed(args.out or "preprocessed")
        print(f"preprocess: {len(rows)} recordings → {args.out or 'preprocessed'}")
        return 0
    if args.command == "graphs":
        n = runner.write_graphs(args.out or "graphs")
        print(f"graphs: {n} recordings → {args.out or 'graphs'}")
        return 0
    if args.command == "eda":
        from .models.eda import run_eda

        out = run_eda(runner.ds, runner.cfg, results_dir=out_dir,
                      eeg_batch=args.batch)
        print(f"eda: {out['n_recordings']} recordings, "
              f"{out['n_subjects']} subjects → eda_summary.json")
        return 0
    if args.command in ("features", "study"):
        bs = args.batch_start if args.batch_start >= 0 else None
        be = args.batch_end if args.batch_end >= 0 else None
        # multi-process: each process takes its deterministic slice and
        # writes a partial; process 0 later merges (--merge-partials) —
        # the reference's BATCH_START/BATCH_END contract, automated
        import jax
        if jax.process_count() > 1 and bs is None and be is None:
            from .runtime import process_shard
            bs, be = process_shard(len(runner.ds))
            args.write_partial = True
            print(f"process shard: recordings [{bs}, {be})")
        X, y, subjects, filenames, meta = runner.compute_feature_dataset(
            batch_start=bs, batch_end=be)
        from .models.classify import feature_names_220

        if args.write_partial:
            pdir = out_dir / "partials"
            pdir.mkdir(parents=True, exist_ok=True)
            np.savez(pdir / f"batch_{bs or 0}_{be if be is not None else len(X)}.npz",
                     X=X, y=y, subjects=subjects,
                     filenames=np.array(filenames),
                     feature_names=np.array(feature_names_220()))
            print(f"partial: {X.shape[0]} rows → {pdir}")
            return 0
        np.save(out_dir / "X.npy", X)
        np.save(out_dir / "y.npy", y)
        np.save(out_dir / "subjects.npy", subjects)
        (out_dir / "feature_names.txt").write_text(
            "\n".join(feature_names_220()) + "\n")
        (out_dir / "filenames.txt").write_text("\n".join(filenames) + "\n")
        _write_feature_metadata(out_dir, meta.get("file_metadata", []))
        print(f"features: X {X.shape} → {out_dir}")
    if args.command == "ablate":
        from .models import classify as cls

        if (out_dir / "X.npy").exists():
            X = np.load(out_dir / "X.npy")
            y = np.load(out_dir / "y.npy")
            subjects = np.load(out_dir / "subjects.npy", allow_pickle=True)
        else:
            X, y, subjects, _, _ = runner.compute_feature_dataset()
        res = cls.run_band_ablation(X, y, subjects, cls.feature_names_220(),
                                    runner.cfg)
        (out_dir / "gamma_investigation.json").write_text(
            json.dumps(res, indent=2))
        print(f"ablate: gamma-only "
              f"{res['classifier_gamma_only']['mean_accuracy']:.4f} vs "
              f"no-gamma {res['classifier_without_gamma']['mean_accuracy']:.4f}")
        return 0
    if args.command in ("classify", "study"):
        if args.command == "classify" and (out_dir / "X.npy").exists():
            from .models import classify as cls

            X = np.load(out_dir / "X.npy")
            y = np.load(out_dir / "y.npy")
            subjects = np.load(out_dir / "subjects.npy", allow_pickle=True)
            res = cls.run_classification(
                X, y, subjects, cls.feature_names_220(), runner.cfg,
                n_permutations=args.permutations, n_bootstrap=args.bootstrap)
            (out_dir / "results_summary.json").write_text(json.dumps(res, indent=2))
        else:
            res = runner.run_classification(args.permutations, args.bootstrap)
        print(f"classify: acc {res['cv_accuracy_mean']:.4f} "
              f"p {res['p_value']:.4g} → results_summary.json")
    if args.command in ("compare", "study"):
        out = runner.run_comparison(args.permutations)
        sig = [b for b, s in out["band_results"].items()
               if s.get("wass_h1_sig_fdr")]
        print(f"compare: significant bands after FDR: {sig or 'none'}")
    if args.command in ("control", "study"):
        res = runner.run_control()
        for band, s in res.items():
            if "p_fdr" in s:
                print(f"control {band}: matched {s['w_matched']:.4f} vs "
                      f"mismatched {s['w_mismatched']:.4f} p_fdr {s['p_fdr']:.4g}")
    if args.command == "study":
        written = runner.write_sample_figures()
        print(f"figures: {len(written)} sample figures → "
              f"{out_dir}/figures")
    return 0


def _write_feature_metadata(out_dir: Path, fmeta: list[dict]) -> None:
    """features/metadata.csv + metadata.json — per-file window counts and
    runtime validation issues (reference tda_eeg_classification_v2.py:684-690,
    C19)."""
    if not fmeta:
        return
    import csv

    with open(out_dir / "metadata.csv", "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=list(fmeta[0].keys()))
        wr.writeheader()
        wr.writerows(fmeta)
    (out_dir / "metadata.json").write_text(
        json.dumps(fmeta, indent=2, ensure_ascii=False))


def _merge_partials(out_dir: Path) -> None:
    """Merge features/partials/batch_*.npz into X/y/subjects arrays with a
    feature-name consistency check (reference
    tda_eeg_classification_v2.py:608-668)."""
    pdir = out_dir / "partials"
    parts = sorted(pdir.glob("batch_*.npz"))
    if not parts:
        raise SystemExit(f"no partials under {pdir}")
    Xs, ys, subjs, fns, names_ref = [], [], [], [], None
    for p in parts:
        z = np.load(p, allow_pickle=True)
        names = list(z["feature_names"])
        if names_ref is None:
            names_ref = names
        elif names != names_ref:
            raise SystemExit(f"feature-name mismatch in {p.name}")
        Xs.append(z["X"]); ys.append(z["y"])
        subjs.append(z["subjects"]); fns.extend(list(z["filenames"]))
    X = np.vstack(Xs)
    np.save(out_dir / "X.npy", X)
    np.save(out_dir / "y.npy", np.concatenate(ys))
    np.save(out_dir / "subjects.npy", np.concatenate(subjs))
    (out_dir / "feature_names.txt").write_text(
        "\n".join(str(n) for n in names_ref) + "\n")
    (out_dir / "filenames.txt").write_text(
        "\n".join(str(f) for f in fns) + "\n")
    print(f"merged {len(parts)} partials → X {X.shape}")


if __name__ == "__main__":
    sys.exit(main())
