"""Figure-stage tests: every reference figure artifact is produced from
summary inputs (reference classification_rerun.py:196-316,
tda_eeg_audio_comparison.py:240-305, paper/figures/*)."""
import numpy as np

from tda_eeg_audio_tpu.config import DEFAULT_CONFIG, FREQ_BANDS
from tda_eeg_audio_tpu.models import figures

BANDS = list(FREQ_BANDS)


def test_classification_figures(tmp_path):
    rng = np.random.default_rng(0)
    res = dict(
        cv_accuracy_mean=0.73, f1_score=0.73, roc_auc=0.80, p_value=0.000999,
        effect_size_cohens_d=15.2, ci_lower_bootstrap=0.69,
        ci_upper_bootstrap=0.76, confusion_matrix=[[504, 206], [174, 532]],
        top_features=[{"feature": f"gamma_h{i % 2}_mean_death_std",
                       "importance": 0.07 - i * 0.002} for i in range(20)],
        band_importance={b: {"importance": v, "pct": v * 100}
                         for b, v in zip(BANDS, (.14, .13, .14, .14, .45))},
    )
    null = rng.normal(0.5, 0.015, 1000)
    boots = rng.normal(0.73, 0.015, 2000)
    written = figures.classification_figures(res, null, boots, tmp_path)
    for name in ("confusion_matrix_v2.png", "statistical_tests_v2.png",
                 "feature_importance_v2.png"):
        assert (tmp_path / name).exists(), name
    for name in ("fig_confusion_matrix.png", "fig_feature_importance.png"):
        assert (tmp_path / "figures" / name).exists(), name
    assert len(written) == 5


def test_comparison_figures(tmp_path):
    rng = np.random.default_rng(1)
    rows = []
    for subj in ("bb01", "bb02", "bb03"):
        for cond in ("slow", "fast"):
            for band in BANDS:
                rows.append(dict(
                    filename=f"{subj}_ut01.mat", subject=subj,
                    condition=cond, band=band,
                    wasserstein_h1=float(rng.uniform(0.8, 1.6)),
                    corr_mean_persistence_r=float(rng.uniform(-0.3, 0.3)),
                    corr_persistence_entropy_r=float(rng.uniform(-0.3, 0.3))))
    band_results = {b: dict(wass_h1_p_fdr=0.01, wass_h1_slow=1.0,
                            wass_h1_fast=1.1) for b in BANDS}
    figures.comparison_figures(rows, band_results, tmp_path)
    assert (tmp_path / "eeg_audio_tda_comparison.png").exists()
    assert (tmp_path / "eeg_audio_tda_temporal_correlation.png").exists()
    assert (tmp_path / "figures" / "fig_wasserstein_comparison.png").exists()
    assert (tmp_path / "figures" / "fig_temporal_correlation.png").exists()


def test_persistence_and_misc_figures(tmp_path):
    rng = np.random.default_rng(2)

    def dgm(n):
        b = rng.uniform(0, 1, n)
        return {"h0": np.stack([np.zeros(n), rng.uniform(0, 1, n)], -1),
                "h1": np.stack([b, b + rng.uniform(0, 0.5, n)], -1)}

    eeg = {b: dgm(10) for b in BANDS}
    aud = {b: dgm(6) for b in BANDS}
    figures.persistence_figures(eeg, aud, tmp_path)
    assert (tmp_path / "figures" / "fig_persistence_diagrams.png").exists()
    assert (tmp_path / "figures" / "fig_sample_persistence.png").exists()
    assert (tmp_path / "persistence_diagrams_comparison.png").exists()

    inventory = [dict(subject=f"bb{i:02d}", condition=c)
                 for i in range(1, 6) for c in ("slow", "fast")]
    figures.subject_distribution_figure(inventory, tmp_path)
    assert (tmp_path / "subject_distribution.png").exists()
    assert (tmp_path / "figures" / "fig_subject_distribution.png").exists()

    figures.filter_response_figure(DEFAULT_CONFIG, tmp_path)
    assert (tmp_path / "figures" / "filter_response.png").exists()

    freqs = np.linspace(0, 125, 126)
    curves = {"freqs": freqs, "slow": 1.0 / (1 + freqs),
              "fast": 0.8 / (1 + freqs)}
    waves = {"slow": rng.standard_normal(500),
             "fast": rng.standard_normal(400)}
    figures.eda_figures(curves, waves, 250, tmp_path)
    assert (tmp_path / "figures" / "eda_psd.png").exists()
    assert (tmp_path / "figures" / "eda_waveforms.png").exists()
