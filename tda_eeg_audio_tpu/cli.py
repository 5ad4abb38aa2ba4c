"""CLI mirroring the reference entry points (SURVEY §7 item 9).

Commands map to the reference scripts:
  features  — feature export       (scripts/tda_eeg_classification_v2.py front half)
  classify  — classification       (scripts/classification_rerun.py)
  compare   — EEG↔audio comparison (scripts/tda_eeg_audio_comparison.py)
  control   — matched/mismatched   (scripts/matched_vs_mismatched.py)
  study     — all of the above
Artifacts use the reference's JSON/CSV schemas for drop-in diffing.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _build_runner(args):
    from .runtime import enable_compilation_cache, force_cpu

    enable_compilation_cache()
    if args.device == "cpu":
        force_cpu()
    from .config import DEFAULT_CONFIG
    from .models.study import StudyRunner

    if args.data:
        from .io.matfiles import MatDataset

        ds = MatDataset(args.data)
    else:
        from .io.synthetic import SynthDataset

        ds = SynthDataset(n_subjects=args.subjects,
                          n_per_subject=args.per_subject)
    return StudyRunner(ds, DEFAULT_CONFIG, eeg_batch=args.batch,
                       tda_chunk=args.chunk, results_dir=args.results,
                       backend=args.backend)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tda-eeg-audio-tpu")
    ap.add_argument("command", choices=["features", "classify", "compare",
                                        "control", "study"])
    ap.add_argument("--data", default=None,
                    help=".mat data root (data/slow, data/fast); default: synthetic")
    ap.add_argument("--subjects", type=int, default=45)
    ap.add_argument("--per-subject", type=int, default=16)
    ap.add_argument("--results", default="results")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--device", choices=["tpu", "cpu"], default="tpu")
    ap.add_argument("--backend", choices=["device", "host"], default=None,
                    help="homology backend (default: device kernel)")
    ap.add_argument("--permutations", type=int, default=None)
    ap.add_argument("--bootstrap", type=int, default=None)
    args = ap.parse_args(argv)

    runner = _build_runner(args)
    out_dir = Path(args.results)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.command in ("features", "study"):
        X, y, subjects, filenames, meta = runner.compute_feature_dataset()
        np.save(out_dir / "X.npy", X)
        np.save(out_dir / "y.npy", y)
        np.save(out_dir / "subjects.npy", subjects)
        (out_dir / "feature_names.txt").write_text(
            "\n".join(__import__("tda_eeg_audio_tpu.models.classify",
                                 fromlist=["feature_names_220"]).feature_names_220()) + "\n")
        (out_dir / "filenames.txt").write_text("\n".join(filenames) + "\n")
        print(f"features: X {X.shape} → {out_dir}")
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
