"""Signal-processing ops: TPU-native (JAX/XLA), batched, static shapes.

Re-designs of the reference's scipy signal chain
(reference scripts/utils.py:47-116, notebooks/1_preprocesamiento.ipynb cells 1-2):

  * Band-pass: the reference runs 4th-order Butterworth `filtfilt`/`sosfiltfilt`
    per channel (IIR, zero phase).  Sequential IIR recursions are hostile to
    TPUs, so the native path is a **linear-phase FIR bank** whose amplitude
    response matches the *zero-phase Butterworth magnitude* |H(ω)|² (filtfilt
    squares the magnitude and cancels the phase).  All 5 bands are applied as
    one grouped convolution → MXU-friendly, fully batched.  This is a declared,
    tolerance-gated deviation (see tests/test_signal_parity.py).
  * Hilbert envelope: the reference uses the FFT analytic signal
    (scipy.signal.hilbert) whose definition depends on the full recording
    length — unbatchable under static shapes.  Native path: an odd-length
    type-III FIR Hilbert transformer (shift-invariant, identical accuracy at
    every sample, batchable), followed by the same FIR-matched 50 Hz low-pass
    the reference applies (reference scripts/utils.py:56-63).
  * Polyphase resampling 44.1 kHz → 250 Hz with scipy.resample_poly's exact
    Kaiser FIR, evaluated as 5 phase-split strided matmuls (MXU).
  * Sliding windows / Takens delay embedding / τ estimation: gathers + FFT
    autocorrelation, vmapped over recordings/windows.

All functions take explicit batch dims and return masks for variable-length
data; nothing here uses data-dependent Python control flow.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PipelineConfig, DEFAULT_CONFIG, FREQ_BANDS

# ─────────────────────────────────────────────────────────────────────────────
# Host-side filter design (runs once at trace time; numpy/scipy only)
# ─────────────────────────────────────────────────────────────────────────────


def _butter_ba(order: int, Wn, btype: str):
    from scipy import signal as sps

    return sps.butter(order, Wn, btype=btype)


@functools.lru_cache(maxsize=None)
def _design_zero_phase_fir(low: float, high: float, fs: int, order: int,
                           numtaps: int, btype: str = "band") -> np.ndarray:
    """Linear-phase FIR matching the zero-phase Butterworth magnitude |H|².

    Matches what filtfilt realizes for the reference's 4th-order Butterworth
    (reference scripts/utils.py:66-74): amplitude |H(ω)|², phase 0.
    """
    from scipy import signal as sps

    nyq = fs / 2.0
    if btype == "band":
        lo = max(low / nyq, 0.001)
        hi = min(high / nyq, 0.999)
        if lo >= hi:  # pass-through edge case (reference utils.py:71-72)
            h = np.zeros(numtaps)
            h[numtaps // 2] = 1.0
            return h
        b, a = sps.butter(order, [lo, hi], btype="band")
    else:
        b, a = sps.butter(order, low / nyq, btype="low")
    grid = 4096
    w, resp = sps.freqz(b, a, worN=grid + 1)
    target = np.abs(resp) ** 2  # filtfilt magnitude
    freq = w / np.pi
    freq[0], freq[-1] = 0.0, 1.0
    h = sps.firwin2(numtaps, freq, target, window="hamming")
    return h.astype(np.float64)


@functools.lru_cache(maxsize=None)
def design_band_fir_bank(fs: int = 250, order: int = 4, numtaps: int = 1537) -> np.ndarray:
    """(5, numtaps) FIR bank for the study's five bands (config.FREQ_BANDS)."""
    bank = [
        _design_zero_phase_fir(lo, hi, fs, order, numtaps)
        for lo, hi in FREQ_BANDS.values()
    ]
    return np.stack(bank).astype(np.float32)


@functools.lru_cache(maxsize=None)
def design_envelope_lowpass(fs: int = 250, order: int = 4, numtaps: int = 801) -> np.ndarray:
    """FIR matching |H|² of the reference's 4th-order 50 Hz Butterworth low-pass
    (reference scripts/utils.py:60-63: cutoff = min(50, 0.9·nyq))."""
    from scipy import signal as sps

    nyq = fs / 2.0
    cutoff = min(50.0, nyq * 0.9)
    b, a = sps.butter(order, cutoff / nyq, btype="low")
    w, resp = sps.freqz(b, a, worN=4097)
    target = np.abs(resp) ** 2
    freq = w / np.pi
    freq[0], freq[-1] = 0.0, 1.0
    h = sps.firwin2(numtaps, freq, target, window="hamming")
    return h.astype(np.float32)


@functools.lru_cache(maxsize=None)
def design_hilbert_fir(numtaps: int = 401) -> np.ndarray:
    """Type-III FIR Hilbert transformer (odd taps, antisymmetric), Kaiser window."""
    assert numtaps % 2 == 1
    n = np.arange(numtaps) - numtaps // 2
    h = np.zeros(numtaps)
    odd = n % 2 != 0
    h[odd] = 2.0 / (np.pi * n[odd])
    h *= np.kaiser(numtaps, 8.0)
    return h.astype(np.float32)


@functools.lru_cache(maxsize=None)
def design_resample_poly_filter(up: int = 250, down: int = 44100) -> tuple[np.ndarray, int, int]:
    """Exact scipy.signal.resample_poly Kaiser FIR (reference utils.py:77-79)."""
    from scipy import signal as sps
    from math import gcd

    g = gcd(up, down)
    up //= g
    down //= g
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = sps.firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return (h * up).astype(np.float64), up, down


# ─────────────────────────────────────────────────────────────────────────────
# Device ops
# ─────────────────────────────────────────────────────────────────────────────


def _odd_ext(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Odd (antisymmetric) extension along the last axis — filtfilt-style edges."""
    left = 2 * x[..., :1] - x[..., pad:0:-1]
    right = 2 * x[..., -1:] - x[..., -2 : -pad - 2 : -1]
    return jnp.concatenate([left, x, right], axis=-1)


def fir_zero_phase(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase FIR along last axis; taps (numtaps,) symmetric; odd extension."""
    numtaps = taps.shape[0]
    pad = numtaps // 2
    xe = _odd_ext(x, pad)
    shape = xe.shape
    lhs = xe.reshape(-1, 1, shape[-1])
    rhs = taps[::-1].reshape(1, 1, numtaps).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(*shape[:-1], out.shape[-1])


def bandpass_bank(x: jnp.ndarray, bank: jnp.ndarray) -> jnp.ndarray:
    """Apply the 5-band zero-phase FIR bank.

    x: (..., T) → (..., 5, T).  One grouped convolution over all bands.
    Replaces per-channel sosfiltfilt loops
    (reference notebooks/1_preprocesamiento.ipynb cell 1 `apply_bandpass_filter`).
    """
    n_bands, numtaps = bank.shape
    pad = numtaps // 2
    xe = _odd_ext(x, pad)
    lead = xe.shape[:-1]
    lhs = xe.reshape(-1, 1, xe.shape[-1])
    rhs = bank[:, ::-1].reshape(n_bands, 1, numtaps).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )  # (prod(lead), 5, T)
    return out.reshape(*lead, n_bands, out.shape[-1])


def sliding_windows(x: jnp.ndarray, n_windows: int, win: int, step: int) -> jnp.ndarray:
    """(..., T) → (..., n_windows, win) by gather.  Caller computes n_windows
    statically from the padded length; invalid windows are masked downstream.
    Mirrors reference create_windows / create_sliding_windows semantics:
    windows start at i*step, i = 0..n_windows-1."""
    starts = jnp.arange(n_windows) * step
    idx = starts[:, None] + jnp.arange(win)[None, :]
    return jnp.take(x, idx, axis=-1)


def hilbert_envelope(x: jnp.ndarray, lp_taps: jnp.ndarray, hilb_taps: jnp.ndarray,
                     mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Amplitude envelope: |analytic| via FIR Hilbert, then 50 Hz zero-phase LP.

    Reference: scripts/utils.py:56-63 (scipy.hilbert + butter-4 LP filtfilt).
    """
    if mask is not None:
        x = x * mask
    xi = fir_zero_phase_antisym(x, hilb_taps)
    env = jnp.sqrt(x * x + xi * xi)
    return fir_zero_phase(env, lp_taps)


def fir_zero_phase_antisym(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Centered FIR with antisymmetric taps (Hilbert). Zero edge extension."""
    numtaps = taps.shape[0]
    pad = numtaps // 2
    xe = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    lhs = xe.reshape(-1, 1, xe.shape[-1])
    rhs = taps[::-1].reshape(1, 1, numtaps).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(*x.shape[:-1], out.shape[-1])


def resample_poly_device(x: jnp.ndarray, n_in: jnp.ndarray, n_out_max: int,
                         h: np.ndarray, up: int, down: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Polyphase rational resampling, scipy.resample_poly-compatible.

    x: (B, T_pad) zero-padded inputs, n_in: (B,) true lengths.
    Returns (y (B, n_out_max), n_out (B,)).

    scipy computes y[m] = sum_t h'[t] · u[m·down − t] where u is the
    up-sampled input and h' is h zero-padded front by `offset` so outputs are
    group-delay centered.  Split by output phase r = (m·down) mod up into `up`
    strided dot products → batched matmuls on the MXU.
    """
    half = (len(h) - 1) // 2
    n_taps_phase = int(np.ceil(len(h) / up)) + 1
    # phase-split filters: h_r[j] covers upsampled lag (j*up + r_shift)
    # y[m] = Σ_t h[t] u[m·down + half − t]; u[j] = x[j/up] when j%up==0.
    # Let j = m·down + half − t = up·k → t = m·down + half − up·k.
    # For each m: r_m = (m·down + half) mod up; k ranges over valid ints.
    B, T_pad = x.shape
    ms = np.arange(n_out_max)
    t0 = ms * down + half  # absolute upsampled center index per output
    k_hi = t0 // up  # largest k with up·k <= t0
    taps_idx = np.arange(n_taps_phase)
    # input index per (m, tap): k_hi[m] − taps_idx
    in_idx = k_hi[:, None] - taps_idx[None, :]
    # filter tap per (m, tap): t = t0 − up·k
    h_idx = t0[:, None] - up * in_idx
    h_pad = np.concatenate([h, np.zeros(up * (n_taps_phase + 2))])
    h_mat = h_pad[np.clip(h_idx, 0, len(h_pad) - 1)]
    h_mat[(h_idx < 0) | (h_idx >= len(h))] = 0.0
    valid_in = in_idx >= 0
    in_idx_c = np.clip(in_idx, 0, T_pad - 1)
    h_mat = jnp.asarray(h_mat * valid_in, dtype=x.dtype)  # (n_out_max, n_taps_phase)
    in_idx_j = jnp.asarray(in_idx_c)

    gathered = x[:, in_idx_j]  # (B, n_out_max, n_taps_phase)
    y = jnp.einsum("bmt,mt->bm", gathered, h_mat,
                   preferred_element_type=jnp.float32)
    n_out = (n_in * up + down - 1) // down
    # zero out samples beyond each recording's true output length and samples
    # that depended on padding beyond n_in
    m_ids = jnp.arange(n_out_max)[None, :]
    y = jnp.where(m_ids < n_out[:, None], y, 0.0)
    return y, n_out


def autocorr_tau(windows: jnp.ndarray, max_lag: int) -> jnp.ndarray:
    """Per-window delay τ — reference scripts/utils.py:92-104 semantics.

    windows: (..., W) → τ (...,) int32.
    τ = first lag i ≥ 1 with normalized autocorr ≤ 0, else max(max_lag//10, 1);
    max_lag = min(max_lag, W−1); τ ≥ 1.
    """
    W = windows.shape[-1]
    ml = min(max_lag, W - 1)
    xc = windows - jnp.mean(windows, axis=-1, keepdims=True)
    n_fft = 2 * W  # ≥ 2W-1 → linear autocorr exact
    F = jnp.fft.rfft(xc, n=n_fft, axis=-1)
    ac = jnp.fft.irfft(F * jnp.conj(F), n=n_fft, axis=-1)[..., :W]
    ac = ac / (ac[..., :1] + 1e-10)
    lags = jnp.arange(W)
    cand = (ac <= 0) & (lags >= 1) & (lags < ml)
    first = jnp.argmax(cand, axis=-1)  # 0 if none
    has = jnp.any(cand, axis=-1)
    fallback = max(ml // 10, 1)
    tau = jnp.where(has, jnp.maximum(first, 1), fallback)
    return tau.astype(jnp.int32)


def takens_embed(windows: jnp.ndarray, tau: jnp.ndarray, dim: int, subsample: int,
                 max_points: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Takens delay embedding — reference scripts/utils.py:107-116.

    windows: (..., W), tau: (...,) → points (..., max_points, dim), mask (..., max_points).
    Point p (after subsampling by `subsample`) = [x[s·p + d·τ] for d in 0..dim-1],
    valid while s·p + (dim−1)·τ < W − ... i.e. s·p ≤ W − 1 − (dim−1)·τ.
    """
    W = windows.shape[-1]
    p_ids = jnp.arange(max_points) * subsample  # base index per point
    d_ids = jnp.arange(dim)

    def one(w, t):
        idx = p_ids[:, None] + d_ids[None, :] * t
        n_valid = W - (dim - 1) * t  # base indices 0..n_valid-1 valid
        mask = p_ids < jnp.maximum(n_valid, 0)
        idx = jnp.clip(idx, 0, W - 1)
        return w[idx], mask

    lead = windows.shape[:-1]
    flat_w = windows.reshape(-1, W)
    flat_t = tau.reshape(-1)
    pts, mask = jax.vmap(one)(flat_w, flat_t)
    return pts.reshape(*lead, max_points, dim), mask.reshape(*lead, max_points)


def minmax_normalize_points(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-axis min-max to [0,1] over valid points; zero range → divide by 1.

    Reference scripts/utils.py:127-130.
    """
    big = jnp.asarray(jnp.finfo(points.dtype).max, points.dtype)
    m = mask[..., None]
    pmin = jnp.min(jnp.where(m, points, big), axis=-2, keepdims=True)
    pmax = jnp.max(jnp.where(m, points, -big), axis=-2, keepdims=True)
    rng = pmax - pmin
    rng = jnp.where(rng == 0, 1.0, rng)
    out = (points - pmin) / rng
    return jnp.where(m, out, 0.0)
