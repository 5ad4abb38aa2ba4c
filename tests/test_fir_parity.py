"""Diagram-level gate of the FIR-for-Butterworth deviation (SURVEY §7
"filter parity"; VERDICT r3 missing #3).

The production band-pass is a linear-phase FIR matched to the zero-phase
Butterworth magnitude |H|²; the reference runs Butterworth filtfilt
(scripts/utils.py:66-74 → compute_eeg_persistence utils.py:135-141 →
downstream statistics).  Waveform-level gates live in test_signal_ops.py;
THIS file gates end-to-end where it matters: per-window diagrams, the 11
features, diagram-space W_H1 between the two filters' outputs, and the
band-level Wilcoxon statistics.

Tolerances are set from the committed measurement study
(scratch/fir_parity_study.py, 12 recordings × 5 bands × 8 windows; see
PARITY.md): the deviation concentrates in DELTA (band-edge ringing at
0.5–4 Hz — band-mean total persistence relΔ 4.2 %, other bands ≤ 0.24 %)
and leaves the Wilcoxon table unchanged (|Δp| ≤ 0.15).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tda_eeg_audio_tpu.config import DEFAULT_CONFIG, GOOD_ELECTRODES

N_REC, K = 8, 6


def _eeg_chain(eeg, ns, impl):
    import dataclasses

    from tda_eeg_audio_tpu.models import programs as P

    cfg = dataclasses.replace(DEFAULT_CONFIG, filter_impl=impl)
    B = eeg.shape[0]
    dist, _, wmask = P.eeg_distance_program(
        jnp.asarray(eeg), jnp.asarray(ns), cfg, 90)
    nw = np.asarray(wmask).sum(1)
    idx = np.stack([np.minimum(np.arange(K), nw[b] - 1) for b in range(B)])
    sel = jnp.take_along_axis(
        dist, jnp.asarray(idx)[:, None, :, None, None], axis=2)
    f, out = P.window_tda_features(sel.reshape(B * 5 * K, 47, 47),
                                   thresh=cfg.max_edge_length)
    m = np.asarray(out["mask"] & jnp.isfinite(out["deaths"]))
    return dict(feats=np.asarray(f).reshape(B, 5, K, 2, 11),
                births=np.asarray(out["births"]),
                deaths=np.where(m, np.asarray(out["deaths"]), 0.0),
                mask=m)


@pytest.fixture(scope="module")
def chains():
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset

    ds = SynthDataset(n_subjects=N_REC, n_per_subject=1)
    T = 5800
    eeg = np.zeros((N_REC, 47, T), np.float32)
    ns = np.zeros(N_REC, np.int32)
    for i in range(N_REC):
        rec = ds.load(i)
        e = rec["eeg_raw"][list(GOOD_ELECTRODES)]
        k = min(e.shape[1], T)
        eeg[i, :, :k] = e[:, :k]
        ns[i] = k
    return _eeg_chain(eeg, ns, "fir"), _eeg_chain(eeg, ns, "iir_scan")


@pytest.mark.slow
def test_fir_features_match_iir(chains):
    """220-feature inputs: near-perfect global agreement; per-band mean
    total persistence within the measured envelope (delta carries the
    band-edge deviation, higher bands are essentially exact)."""
    a, b = chains
    fa, fb = a["feats"], b["feats"]
    r = np.corrcoef(fa.ravel(), fb.ravel())[0, 1]
    assert r > 0.995, r
    for dim in (0, 1):   # H0, H1
        ma = fa[..., dim, 9].mean(axis=(0, 2))    # (5,) band means
        mb = fb[..., dim, 9].mean(axis=(0, 2))
        rel = np.abs(ma - mb) / (np.abs(mb) + 1e-9)
        assert rel[0] < 0.08, ("delta", dim, rel)          # measured 0.042
        assert np.all(rel[1:] < 0.02), (dim, rel)          # measured ≤0.0024


@pytest.mark.slow
def test_fir_diagrams_close_in_wasserstein(chains):
    """Per-window W_H1 between the two filters' diagrams, relative to the
    diagrams' own persistence mass: small in the typical case (measured
    median 1.5 %), bounded in the tail (delta band edge windows)."""
    from tda_eeg_audio_tpu.ops.wasserstein import (build_cost_matrix,
                                                   sinkhorn_cost)

    a, b = chains
    w = np.asarray(sinkhorn_cost(build_cost_matrix(
        jnp.asarray(a["births"]), jnp.asarray(a["deaths"]),
        jnp.asarray(a["mask"]),
        jnp.asarray(b["births"]), jnp.asarray(b["deaths"]),
        jnp.asarray(b["mask"]))))
    mass = np.maximum(((a["deaths"] - a["births"]) * a["mask"]).sum(1)
                      + ((b["deaths"] - b["births"]) * b["mask"]).sum(1),
                      2e-9) / 2.0
    rel = w / mass
    assert np.median(rel) < 0.05, np.median(rel)          # measured 0.015
    assert np.percentile(rel, 95) < 0.7, np.percentile(rel, 95)


@pytest.mark.slow
def test_fir_band_statistics_stable(chains):
    """The statistics consumers (per-band Wilcoxon on recording means) are
    unmoved by the deviation: |Δp| small, W-statistic sign pattern equal."""
    from tda_eeg_audio_tpu.ops import stats as dstats

    a, b = chains
    for dim in (0, 1):
        ma = a["feats"][..., dim, 9].mean(-1)              # (B, 5)
        mb = b["feats"][..., dim, 9].mean(-1)
        for bd in range(5):
            da = ma[:, bd] - ma[:, bd].mean()
            db = mb[:, bd] - mb[:, bd].mean()
            _, p_a = dstats.wilcoxon(jnp.asarray(da[None], jnp.float32),
                                     jnp.ones((1, len(da)), bool))
            _, p_b = dstats.wilcoxon(jnp.asarray(db[None], jnp.float32),
                                     jnp.ones((1, len(db)), bool))
            dp = abs(float(np.asarray(p_a)[0]) - float(np.asarray(p_b)[0]))
            assert dp < 0.25, (dim, bd, dp)                # measured ≤0.15
