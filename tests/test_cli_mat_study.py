"""End-to-end MatDataset CLI study (VERDICT r4 next #8): synthetic
65-electrode, TRANSPOSED .mat recordings with stereo audio driven through
`cli study --data` on CPU, asserting the three result JSONs appear with
finite rows.  test_matfiles covers the loader in isolation; this is the
only test driving the full CLI path on .mat input.

Reference data contract: /root/reference/README.md:24-39 — .mat keys
`subeeg` (65 × samples, possibly transposed), `y` (audio, possibly
stereo), `Fs`; directory layout <root>/{slow,fast}/*.mat; subject =
filename prefix before `_`.

Runs in a subprocess with env-shrunk study pads (TDA_TPU_T_EEG_PAD etc. —
the production comparison program's pads make its CPU compile exceed 30
minutes; at these tiny pads the whole study compiles and runs in a couple
of minutes)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

slow = pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                          reason="set RUN_SLOW=1 (subprocess CPU compiles)")

BANDS = {"delta", "theta", "alpha", "beta", "gamma"}


@slow
def test_cli_study_on_mat_dataset(tmp_path):
    from scipy.io import savemat

    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    durs = iter([1.3, 1.8, 2.1, 1.5, 1.9, 1.4, 2.0, 1.6, 1.7, 2.2, 1.3, 1.8])
    for cond in ("slow", "fast"):
        (root / cond).mkdir(parents=True)
        for s in range(6):
            dur = next(durs)
            n_e = int(round(250 * dur))
            n_a = int(round(44100 * dur))
            eeg = rng.standard_normal((65, n_e))
            # TRANSPOSED on disk (samples, 65) + stereo audio: the loader
            # must transpose back and channel-mean (io/matfiles.py)
            savemat(root / cond / f"bb{s:02d}_ut01.mat",
                    dict(subeeg=eeg.T,
                         y=rng.standard_normal((n_a, 2)),
                         Fs=np.array([[44100]])))
    out = tmp_path / "results"
    env = dict(os.environ,
               TDA_TPU_T_EEG_PAD="600",        # max rec 2.2 s → 550 samples
               TDA_TPU_T_AUDIO_PAD="97020",    # 2.2 s × 44100
               TDA_TPU_N_RS_MAX="560")         # ceil(97020·5/882) = 550
    r = subprocess.run(
        [sys.executable, "-m", "tda_eeg_audio_tpu.cli", "study",
         "--data", str(root), "--results", str(out), "--device", "cpu",
         "--mesh", "off", "--batch", "4", "--chunk", "16",
         "--permutations", "16", "--bootstrap", "16"],
        capture_output=True, text=True, env=env,
        cwd=Path(__file__).resolve().parents[1], timeout=3000)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    summary = json.loads((out / "results_summary.json").read_text())
    assert np.isfinite(summary["cv_accuracy_mean"])
    assert summary["n_samples"] == 12

    comp = json.loads((out / "eeg_audio_tda_comparison.json").read_text())
    assert set(comp["band_results"]) == BANDS
    for band, s in comp["band_results"].items():
        assert np.isfinite(s["wass_h1_slow"]), band
        assert np.isfinite(s["wass_h1_fast"]), band

    ctl = json.loads((out / "matched_vs_mismatched.json").read_text())
    assert set(ctl) >= BANDS
    for band in BANDS:
        assert np.isfinite(ctl[band]["w_matched"]), band
        assert np.isfinite(ctl[band]["w_mismatched"]), band

    # detailed CSV: one row per (recording, band), every Wasserstein finite
    detailed = (out / "eeg_audio_tda_detailed.csv").read_text().splitlines()
    header = detailed[0].split(",")
    assert len(detailed) - 1 == 12 * 5
    w_col = header.index("wasserstein_h1")
    for line in detailed[1:]:
        assert np.isfinite(float(line.split(",")[w_col]))
