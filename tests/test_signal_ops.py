"""Parity tests: TPU signal ops vs the scipy-faithful oracle chain."""
import numpy as np
import pytest
import jax.numpy as jnp

from tda_eeg_audio_tpu.ops import signal as tsig
from tda_eeg_audio_tpu.ops import geometry as tgeo
from tda_eeg_audio_tpu.oracle import signal_ref as ref


def _corr(a, b):
    a = np.asarray(a, float).ravel()
    b = np.asarray(b, float).ravel()
    a -= a.mean(); b -= b.mean()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


@pytest.fixture(scope="module")
def eeg():
    rng = np.random.default_rng(0)
    # band-mixture signal like synthetic EEG
    t = np.arange(4000) / 250.0
    x = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6, (4, 1))) for f in (2, 6, 10.5, 22, 41))
    x = x + 0.5 * rng.standard_normal((4, 4000))
    return x


@pytest.mark.parametrize("band", ["delta", "theta", "alpha", "beta", "gamma"])
def test_fir_bandpass_matches_butter_filtfilt(eeg, band):
    """FIR-matched |H_butter|² vs scipy filtfilt: interior-sample agreement.

    Declared deviation (SURVEY §7): different edge handling; gate on interior
    correlation and RMS ratio.
    """
    from tda_eeg_audio_tpu.config import FREQ_BANDS

    lo, hi = FREQ_BANDS[band]
    bank = tsig.design_band_fir_bank(250, 4, 1537)
    idx = list(FREQ_BANDS).index(band)
    y_fir = np.array(tsig.fir_zero_phase(jnp.asarray(eeg, jnp.float32),
                                         jnp.asarray(bank[idx])))
    y_ref = np.stack([ref.bandpass_filter(ch, 250, lo, hi) for ch in eeg])
    # compare away from the edges (both methods have edge transients)
    sl = slice(700, -700)
    c = _corr(y_fir[:, sl], y_ref[:, sl])
    assert c > 0.999, f"{band}: corr {c}"
    rms_ratio = np.std(y_fir[:, sl]) / np.std(y_ref[:, sl])
    assert 0.98 < rms_ratio < 1.02, f"{band}: rms ratio {rms_ratio}"


def test_bandpass_bank_consistent_with_single(eeg):
    bank = tsig.design_band_fir_bank(250, 4, 1537)
    x = jnp.asarray(eeg, jnp.float32)
    all_bands = np.array(tsig.bandpass_bank(x, jnp.asarray(bank)))
    for i in range(5):
        single = np.array(tsig.fir_zero_phase(x, jnp.asarray(bank[i])))
        np.testing.assert_allclose(all_bands[:, i], single, rtol=1e-5, atol=1e-5)


def test_sliding_windows_match_reference(eeg):
    x = eeg[0]
    w_ref = ref.create_windows(x, 250, 62)
    n = (len(x) - 250) // 62 + 1
    w_dev = np.array(tsig.sliding_windows(jnp.asarray(x, jnp.float32), n, 250, 62))
    assert w_dev.shape == w_ref.shape
    np.testing.assert_allclose(w_dev, w_ref, rtol=1e-6, atol=1e-6)


def test_multichannel_windows_match_notebook(eeg):
    w_ref, t_ref = ref.create_sliding_windows(eeg, 1.0, 0.75, 250)
    n = w_ref.shape[0]
    w_dev = np.array(tsig.sliding_windows(jnp.asarray(eeg, jnp.float32), n, 250, 62))
    # device layout (C, n, W) vs reference (n, C, W)
    np.testing.assert_allclose(np.moveaxis(w_dev, 0, 1), w_ref, rtol=1e-6, atol=1e-6)


def test_resample_poly_parity():
    rng = np.random.default_rng(1)
    n = 44100 * 3 + 1234
    x = rng.standard_normal(n)
    y_ref = ref.resample_audio(x)
    h, up, down = tsig.design_resample_poly_filter()
    n_pad = 44100 * 4
    xp = np.zeros(n_pad); xp[:n] = x
    n_out_max = int(np.ceil(n_pad * up / down))
    y_dev, n_out = tsig.resample_poly_device(
        jnp.asarray(xp[None], jnp.float32), jnp.asarray([n]), n_out_max, h, up, down)
    n_out = int(np.array(n_out)[0])
    assert n_out == len(y_ref)
    y_dev = np.array(y_dev)[0, :n_out]
    err = np.max(np.abs(y_dev - y_ref)) / (np.max(np.abs(y_ref)) + 1e-30)
    assert err < 5e-4, f"resample rel err {err}"


def test_hilbert_envelope_close_to_scipy():
    rng = np.random.default_rng(2)
    t = np.arange(4000) / 250.0
    x = (1 + 0.6 * np.sin(2 * np.pi * 3.7 * t)) * np.sin(2 * np.pi * 37.0 * t)
    x += 0.05 * rng.standard_normal(len(t))
    env_ref = ref.compute_envelope(x, 250)
    lp = tsig.design_envelope_lowpass(250)
    hb = tsig.design_hilbert_fir()
    env_dev = np.array(tsig.hilbert_envelope(jnp.asarray(x[None], jnp.float32),
                                             jnp.asarray(lp), jnp.asarray(hb)))[0]
    sl = slice(500, -500)
    c = _corr(env_dev[sl], env_ref[sl])
    assert c > 0.999, f"envelope corr {c}"
    assert abs(env_dev[sl].mean() - env_ref[sl].mean()) < 0.02 * abs(env_ref[sl].mean())


def test_tau_matches_reference():
    rng = np.random.default_rng(3)
    wins = []
    t = np.arange(250) / 250.0
    for f in [1.0, 3.0, 7.5, 20.0, 45.0]:
        wins.append(np.sin(2 * np.pi * f * t) + 0.1 * rng.standard_normal(250))
    wins.append(rng.standard_normal(250))
    wins = np.stack(wins)
    tau_ref = np.array([ref.compute_tau(w, max_lag=125) for w in wins])
    tau_dev = np.array(tsig.autocorr_tau(jnp.asarray(wins, jnp.float32), 125))
    np.testing.assert_array_equal(tau_dev, tau_ref)


def test_takens_matches_reference():
    rng = np.random.default_rng(4)
    w = np.sin(np.arange(250) * 0.2) + 0.1 * rng.standard_normal(250)
    for tau in [1, 5, 20, 60, 102]:
        pc_ref = ref.takens_embedding(w, 3, tau, 2)
        pts, mask = tsig.takens_embed(jnp.asarray(w[None], jnp.float32),
                                      jnp.asarray([tau]), 3, 2, 124)
        pts, mask = np.array(pts)[0], np.array(mask)[0]
        nv = int(mask.sum())
        assert nv == len(pc_ref), f"tau={tau}"
        np.testing.assert_allclose(pts[:nv], pc_ref, rtol=1e-6, atol=1e-6)
        # normalization parity
        pc_n_ref = ref.normalize_point_cloud(pc_ref)
        pn = np.array(tsig.minmax_normalize_points(
            jnp.asarray(pts[None]), jnp.asarray(mask[None])))[0]
        np.testing.assert_allclose(pn[:nv], pc_n_ref, rtol=1e-5, atol=1e-5)


def test_correlation_distance_parity():
    rng = np.random.default_rng(5)
    w = rng.standard_normal((47, 250))
    w[3] = 0.0  # zero-variance channel
    r_ref = ref.compute_correlation_matrix(w)
    d_ref = ref.correlation_to_distance(r_ref.copy())
    r_dev = np.array(tgeo.correlation_matrix(jnp.asarray(w[None], jnp.float32)))[0]
    d_dev = np.array(tgeo.correlation_to_distance(jnp.asarray(r_dev[None])))[0]
    np.testing.assert_allclose(r_dev, r_ref, atol=2e-5)
    np.testing.assert_allclose(d_dev, d_ref, atol=5e-4)


def test_pairwise_distance_padding():
    rng = np.random.default_rng(6)
    pts = rng.random((1, 10, 3)).astype(np.float32)
    mask = np.ones((1, 10), bool); mask[0, 7:] = False
    d = np.array(tgeo.pairwise_distances(jnp.asarray(pts), jnp.asarray(mask), 9.0))[0]
    diff = pts[0, :7, None] - pts[0, None, :7]
    np.testing.assert_allclose(d[:7, :7], np.sqrt((diff ** 2).sum(-1)), atol=1e-5)
    assert np.all(d[7:, :7] == 9.0) and np.all(d[:7, 7:] == 9.0)
