"""Fused comparison program vs the staged host-exact path.

Gated behind RUN_SLOW=1: the audio H1 kernel compile takes tens of minutes
on CPU.  The default suite covers the pieces (homology bar-for-bar, Sinkhorn
vs exact JV, Spearman/Wilcoxon vs scipy); this test checks the fused
composition end-to-end.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                                reason="set RUN_SLOW=1 (long CPU compile)")


def test_fused_rows_match_staged():
    import dataclasses
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.study import StudyRunner

    ds = SynthDataset(n_subjects=2, n_per_subject=2)
    cfg_f = dataclasses.replace(DEFAULT_CONFIG, wasserstein_backend="sinkhorn")
    fused = StudyRunner(ds, cfg_f, eeg_batch=4, tda_chunk=64, verbose=False)
    rows_f = {(r["filename"], r["band"]): r for r in fused._fused_rows()}

    staged = StudyRunner(ds, DEFAULT_CONFIG, eeg_batch=4, tda_chunk=64,
                         verbose=False)
    out = staged.run_comparison(n_permutations=10)
    for r in out["detailed_rows"]:
        f = rows_f[(r["filename"], r["band"])]
        assert f["n_windows"] == r["n_windows"]
        assert f["tau"] == r["tau"]
        np.testing.assert_allclose(f["wasserstein_h0"], r["wasserstein_h0"],
                                   rtol=2e-3)
        np.testing.assert_allclose(f["wasserstein_h1"], r["wasserstein_h1"],
                                   rtol=2e-3)
        np.testing.assert_allclose(f["corr_mean_persistence_r"],
                                   r["corr_mean_persistence_r"], atol=1e-4)
