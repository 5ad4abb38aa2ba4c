"""Fused device programs for the two analysis branches — the framework's
"models".  Each is a single jitted program over a batch of padded recordings;
window-level work (filter → window → correlation → Rips → features) happens in
one device computation with no host round-trips.

Reference call stacks replaced (SURVEY §3):
  * EEG branch: notebooks/1_preprocesamiento.ipynb (load→filter→window) +
    notebooks/2_graph_construction.ipynb (corr→distance) +
    scripts/tda_eeg_classification_v2.py:338-442 (diagrams→features).
  * Audio branch: scripts/tda_eeg_audio_comparison.py:45-99 and
    scripts/matched_vs_mismatched.py:35-63 (resample→envelope→band→window→
    τ→Takens→diagrams).
"""

from __future__ import annotations

import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PipelineConfig, DEFAULT_CONFIG, FREQ_BANDS
from ..ops import signal as tsig
from ..ops import geometry as tgeo
from ..ops.homology_h1 import h1_diagrams
from ..ops.features import diagram_features, aggregate_mean_std

N_BANDS = len(FREQ_BANDS)


# ─────────────────────────────────────────────────────────────────────────────
# EEG branch
# ─────────────────────────────────────────────────────────────────────────────


def _banded_windows(eeg, n_samples, cfg, n_win_max):
    """Shared front half: filter bank → 1 s / 75 % sliding windows.

    Returns (wins (B, 5, W, C, win), wmask (B, W))."""
    if cfg.filter_impl == "iir_scan":
        # exact Butterworth sosfiltfilt parity path (length-aware)
        banded = tsig.bandpass_bank_iir_scan(
            eeg, n_samples[:, None], cfg.fs_eeg, cfg.filter_order)
    else:
        bank = jnp.asarray(tsig.design_band_fir_bank(
            cfg.fs_eeg, cfg.filter_order, cfg.fir_numtaps))
        banded = tsig.bandpass_bank(eeg, bank)                # (B, C, 5, T)
    win, step = cfg.win_samples, cfg.step_samples
    wins = tsig.sliding_windows(banded, n_win_max, win, step)  # (B, C, 5, W, win)
    wins = jnp.transpose(wins, (0, 2, 3, 1, 4))               # (B, 5, W, C, win)
    starts = jnp.arange(n_win_max) * step
    wmask = (starts + win)[None, :] <= n_samples[:, None]     # (B, W)
    return wins, wmask


@partial(jax.jit, static_argnames=("cfg", "n_win_max"))
def eeg_window_program(eeg: jnp.ndarray, n_samples: jnp.ndarray,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       n_win_max: int = 89):
    """(B, 47, T_pad) padded EEG → banded windows (the preprocessed/ stage,
    reference notebooks/1_preprocesamiento.ipynb cell 3)."""
    return _banded_windows(eeg, n_samples, cfg, n_win_max)


@partial(jax.jit, static_argnames=("cfg", "n_win_max"))
def eeg_distance_program(eeg: jnp.ndarray, n_samples: jnp.ndarray,
                         cfg: PipelineConfig = DEFAULT_CONFIG,
                         n_win_max: int = 89):
    """(B, 47, T_pad) padded EEG → per-band windowed distance matrices.

    Returns (dist (B, 5, n_win_max, 47, 47), corr, wmask (B, n_win_max)).
    Windows are the reference's 1 s / 75 % sliding windows; invalid windows
    (beyond each recording's true length) are masked.
    """
    wins, wmask = _banded_windows(eeg, n_samples, cfg, n_win_max)
    corr = tgeo.correlation_matrix(wins)
    dist = tgeo.correlation_to_distance(corr, cfg.distance_method)
    return dist, corr, wmask


@partial(jax.jit, static_argnames=("thresh", "na_max", "h1_max", "step_budget",
                                   "backend"))
def window_tda_features(dm: jnp.ndarray, thresh: float = 2.0, na_max: int = 128,
                        h1_max: int = 128, step_budget: int = 4096,
                        backend: str = "auto"):
    """(B, 47, 47) distance matrices → (B, 2, 11) H0/H1 features + diagrams.

    Implements the reference per-window step: compute_persistence_diagram +
    extract_persistence_features for H0 and H1
    (reference scripts/tda_eeg_classification_v2.py:407-419).

    backend: "auto" resolves via h1_backend_auto at trace time — the
    per-window Pallas kernel above the measured size crossover on TPU,
    the portable XLA lockstep otherwise.
    """
    n = dm.shape[-1]
    out = h1_diagrams_routed(dm, n=n, thresh=thresh, na_max=na_max,
                             h1_max=h1_max, step_budget=step_budget,
                             backend=backend)
    # H0: finite deaths from the in-kernel MST; one essential class per
    # component (EEG windows are connected at thresh → exactly 1)
    n_comp = (n - out["n_tree"]).astype(jnp.int32)
    f_h0 = diagram_features(jnp.zeros_like(out["h0_deaths"]), out["h0_deaths"],
                            out["h0_mask"], n_comp)
    fin = out["mask"] & jnp.isfinite(out["deaths"])
    f_h1 = diagram_features(out["births"], jnp.where(fin, out["deaths"], 0.0),
                            fin, out["n_essential"])
    feats = jnp.stack([f_h0, f_h1], axis=1)                   # (B, 2, 11)
    return feats, out


@partial(jax.jit, static_argnames=("cfg", "n_win_max", "K", "chunk", "na_max",
                                   "step_budget", "return_dm0", "return_bank"))
def eeg_feature_program(eeg: jnp.ndarray, n_samples: jnp.ndarray,
                        use_idx: jnp.ndarray, use_mask: jnp.ndarray,
                        cfg: PipelineConfig = DEFAULT_CONFIG,
                        n_win_max: int = 90, K: int = 39, chunk: int = 512,
                        na_max: int = 128, step_budget: int = 4096,
                        return_dm0: bool = False, return_bank: bool = False):
    """FUSED features stage: padded EEG → 220-dim aggregate, one device call.

    The whole per-recording pipeline (filter → window-select → corr → dist →
    exact H0/H1 → 11 features → mean/std aggregation) runs in a single jitted
    program; only the (B, 5, 2, 11, 2) aggregate leaves the device.  This is
    the throughput path — on this platform host↔device transfers run at
    ~10 MB/s with ~40 ms round-trip latency, so the staged path (reference
    scripts/tda_eeg_classification_v2.py materializes graphs/ then features)
    is replaced by end-to-end fusion; `write_graphs` still materializes the
    artifact contract when asked.

    use_idx/use_mask: (B, 5, K) selected window indices per band (the
    reference's md5-seeded subsample, computed on host from window counts).
    Homology runs in lax.map chunks to bound the reduction workspace; the
    chunk axis is the WINDOW axis with the batch axis preserved, so a
    dp-sharded batch (multi-chip, SURVEY §2.3) stays local to its devices
    through every chunk — no GSPMD resharding.
    """
    B = eeg.shape[0]
    wins, wmask = _banded_windows(eeg, n_samples, cfg, n_win_max)
    # select the K sampled windows per band BEFORE the correlation stage
    sel = jnp.take_along_axis(
        wins, use_idx[:, :, :, None, None], axis=2)       # (B, 5, K, C, win)
    corr = tgeo.correlation_matrix(sel)
    dist = tgeo.correlation_to_distance(corr, cfg.distance_method)
    n = dist.shape[-1]
    M = N_BANDS * K
    chunk_m = max(min(chunk, B * M) // B, 1)
    n_chunks = -(-M // chunk_m)
    pad_m = n_chunks * chunk_m - M
    dist4 = dist.reshape(B, M, n, n)
    if pad_m:
        # pad windows = empty complexes (all edges > thresh) → zero work
        far = (1.0 - jnp.eye(n)) * (cfg.max_edge_length + 1.0)
        dist4 = jnp.concatenate(
            [dist4, jnp.broadcast_to(far, (B, pad_m, n, n))], axis=1)

    def do_chunk(dm):                                     # (B, chunk_m, n, n)
        f, out = window_tda_features(dm.reshape(B * chunk_m, n, n),
                                     thresh=cfg.max_edge_length,
                                     na_max=na_max, h1_max=na_max,
                                     step_budget=step_budget)
        res = dict(f=f.reshape(B, chunk_m, 2, 11),
                   ovf=out["overflow"].reshape(B, chunk_m))
        if return_bank:
            # per-window diagrams, pre-packed in the comparison program's
            # _h0_pack/_h1_pack convention so the bank path consumes them
            # without touching the kernel outputs again
            fin = out["mask"] & jnp.isfinite(out["deaths"])
            h0d = jnp.where(jnp.isfinite(out["h0_deaths"]),
                            out["h0_deaths"], 0.0)
            res.update(
                h1_b=out["births"].reshape(B, chunk_m, -1),
                h1_d=jnp.where(fin, out["deaths"], 0.0)
                        .reshape(B, chunk_m, -1),
                h1_m=fin.reshape(B, chunk_m, -1),
                h0_d=h0d.reshape(B, chunk_m, -1),
                h0_m=out["h0_mask"].reshape(B, chunk_m, -1))
        return res

    stacked = jnp.moveaxis(
        dist4.reshape(B, n_chunks, chunk_m, n, n), 1, 0)
    mapped = jax.lax.map(do_chunk, stacked)

    def unchunk(x):       # (n_chunks, B, chunk_m, ...) → (B, M, ...)
        return jnp.moveaxis(x, 0, 1).reshape(
            B, n_chunks * chunk_m, *x.shape[3:])[:, :M]

    feats, ovf = mapped["f"], mapped["ovf"]
    bank = ({k: unchunk(mapped[k])
             for k in ("h1_b", "h1_d", "h1_m", "h0_d", "h0_m")}
            if return_bank else None)
    if return_bank:
        bank["feats"] = unchunk(feats)
    feats = jnp.moveaxis(feats, 0, 1).reshape(B, n_chunks * chunk_m, 2, 11)
    feats = feats[:, :M].reshape(B, N_BANDS, K, 22)
    # per-recording overflow (na_max/step-budget exceeded on any used
    # window): the caller reroutes those recordings through the staged
    # path's host fallback instead of silently keeping a truncated diagram
    ovf_cols = jnp.moveaxis(ovf, 0, 1).reshape(
        B, n_chunks * chunk_m)[:, :M].reshape(B, N_BANDS, K)
    ovf = (ovf_cols & use_mask.reshape(B, N_BANDS, K)).any(axis=(1, 2))
    if return_bank:
        # bank rows must be exact on EVERY column — union mode appends the
        # comparison's paired windows as mask=False columns (excluded from
        # the feature aggregate, hence from `ovf`), but a truncated diagram
        # there would silently corrupt comparison_from_bank.  The driver
        # drops `ovf`-flagged rows from the bank without triggering the
        # staged feature redo.
        bank["ovf"] = ovf_cols.any(axis=(1, 2))
    agg = aggregate_mean_std(feats, use_mask.reshape(B, N_BANDS, K))
    agg = agg.reshape(B, N_BANDS, 2, 11, 2)
    if not return_dm0:
        return (agg, ovf, bank) if return_bank else (agg, ovf)
    # window-0 distance-matrix DIAGNOSTICS per band for host-side runtime
    # validation — the reference validates distance_matrices[0] of each
    # band at runtime and persists issues into per-file metadata (C14;
    # tda_eeg_classification_v2.py:376-382).  The 8 scalars per matrix
    # (utils/validation.py issues_from_diagnostics) replace the (B,5,n,n)
    # matrices in the readback: ~64 MB → ~170 KB over the full study on
    # this deployment's 30-115 MB/s link.
    corr0 = tgeo.correlation_matrix(wins[:, :, 0])            # (B, 5, n, n)
    dm0 = tgeo.correlation_to_distance(corr0, cfg.distance_method)
    if return_bank:
        return agg, _dm_diagnostics(dm0), ovf, bank
    return agg, _dm_diagnostics(dm0), ovf


def _dm_diagnostics(dm: jnp.ndarray) -> jnp.ndarray:
    """(..., n, n) → (..., 8) [sym_bad, max_asym, neg_bad, min_val,
    diag_bad, max_abs_diag, has_nan, has_inf] — device twin of
    utils.validation.matrix_diagnostics (same tolerances as the
    reference's validate_distance_matrix, tda_eeg_classification_v2.py:
    110-140); NaN propagates through the maxima exactly as numpy's."""
    dmt = jnp.swapaxes(dm, -1, -2)
    ad = jnp.abs(dm - dmt)
    # (dm == dmt) escape: np.allclose treats equal infs as close, while
    # inf - inf is NaN in the difference
    sym_ok = jnp.all((dm == dmt) | (ad <= 1e-8 + 1e-5 * jnp.abs(dmt)),
                     axis=(-1, -2))
    diag = jnp.diagonal(dm, axis1=-2, axis2=-1)
    diag_ok = jnp.all(jnp.abs(diag) <= 1e-10, axis=-1)
    min_val = jnp.min(dm, axis=(-1, -2))
    f = lambda b: b.astype(jnp.float32)
    return jnp.stack([
        f(~sym_ok), jnp.max(ad, axis=(-1, -2)), f(min_val < -1e-10),
        min_val, f(~diag_ok), jnp.max(jnp.abs(diag), axis=-1),
        f(jnp.any(jnp.isnan(dm), axis=(-1, -2))),
        f(jnp.any(jnp.isinf(dm), axis=(-1, -2)))], axis=-1)


def recording_features(dist: jnp.ndarray, use_idx: jnp.ndarray,
                       use_mask: jnp.ndarray, thresh: float = 2.0,
                       chunk: int = 256):
    """Per-recording 220-dim feature rows from windowed distance matrices.

    dist: (B, 5, W, 47, 47); use_idx/use_mask: (B, 5, K) selected window
    indices per band (the reference's deterministic md5-seeded subsampling,
    computed on host — scripts/tda_eeg_classification_v2.py:384-401).
    Returns (B, 5, 2, 11, 2) [band, dim, feature, mean/std].
    """
    B, nb, W, n, _ = dist.shape
    K = use_idx.shape[-1]
    sel = jnp.take_along_axis(
        dist, use_idx[:, :, :, None, None], axis=2)           # (B, 5, K, n, n)
    flat = sel.reshape(B * nb * K, n, n)
    outs = []
    for c in range(0, flat.shape[0], chunk):
        end = min(c + chunk, flat.shape[0])
        blk = flat[c:end]
        if blk.shape[0] < chunk:  # pad to compiled batch size
            blk = jnp.concatenate(
                [blk, jnp.tile(blk[-1:], (chunk - blk.shape[0], 1, 1))], axis=0)
        f, _ = window_tda_features(blk, thresh=thresh)
        outs.append(f[: end - c])
    feats = jnp.concatenate(outs, axis=0).reshape(B, nb, K, 2, 11)
    agg = aggregate_mean_std(
        feats.reshape(B, nb, K, 22), use_mask.reshape(B, nb, K))
    return agg.reshape(B, nb, 2, 11, 2)


# ─────────────────────────────────────────────────────────────────────────────
# Fused EEG↔audio comparison (one device call per batch)
# ─────────────────────────────────────────────────────────────────────────────


def _wass_h0_exact_chunked(d1, m1, d2, m2, chunk=2048):
    """Exact H0 Wasserstein (monotone-matching DP) over device-resident
    death arrays — see ops.wasserstein.wasserstein_h0_exact."""
    from ..ops.wasserstein import wasserstein_h0_exact

    N = d1.shape[0]
    outs = []
    for c in range(0, N, chunk):
        end = min(c + chunk, N)
        args = []
        for v in (d1, m1, d2, m2):
            blk = v[c:end]
            if end - c < chunk:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((chunk - (end - c), v.shape[1]), v.dtype)])
            args.append(blk)
        outs.append(wasserstein_h0_exact(*args)[: end - c])
    return jnp.concatenate(outs)


W_TIERS = (16, 40, 80)    # bar-count buckets; study H1 pairs mostly ≤ 15 bars


@jax.jit
def _compact_rows(b, d, m):
    """Move each diagram's valid bars to the front of its pad row (stable).

    The persim cost is a function of the SET of valid bars — compaction is
    a within-row permutation, so downstream width slicing at tier w keeps
    every valid bar whenever the row holds ≤ w of them."""
    ci = jnp.argsort(~m, axis=1, stable=True)
    return (jnp.take_along_axis(b, ci, 1), jnp.take_along_axis(d, ci, 1),
            jnp.take_along_axis(m, ci, 1))


@jax.jit
def _wass_chunk_tiered(bb1, dd1, mm1, bb2, dd2, mm2):
    """Sinkhorn chunk at the narrowest pad width that holds every bar.

    The Sinkhorn cost scales with (K1+K2)²; study H1 diagram pairs hold
    ≤ ~15 real bars inside 96-wide pads, so after compaction most chunks
    run the (16+16)² program — ~36x less arithmetic than full width.  The
    lax.cond ladder falls back to wider tiers only when some row in the
    chunk actually has a bar beyond the slice: exactness is never traded
    (the pad slots are forced zero-cost pad↔pad matches, so the valid
    sub-assignment is width-invariant — VERDICT r2 next #1 (iv))."""
    from ..ops.wasserstein import build_cost_matrix, sinkhorn_cost_stab

    def run(w):
        def f():
            return sinkhorn_cost_stab(build_cost_matrix(
                bb1[:, :w], dd1[:, :w], mm1[:, :w],
                bb2[:, :w], dd2[:, :w], mm2[:, :w]))
        return f

    def full():
        return sinkhorn_cost_stab(
            build_cost_matrix(bb1, dd1, mm1, bb2, dd2, mm2))

    expr = full
    for w in W_TIERS[::-1]:
        if w >= max(mm1.shape[1], mm2.shape[1]):
            continue
        fits = ~(jnp.any(mm1[:, w:]) | jnp.any(mm2[:, w:]))
        expr = (lambda ok=fits, wide=expr, narrow=run(w):
                jax.lax.cond(ok, narrow, wide))
    return expr()


@partial(jax.jit, static_argnames=("chunk",))
def _wass_sinkhorn_tiered(b1, d1, m1, b2, d2, m2, chunk=128):
    """Size-sorted tiered Sinkhorn over (N, K) padded diagram pairs.

    Pairs are sorted by bar count so each fixed-size chunk is homogeneous:
    the few dense pairs share the wide-tier chunks and the long tail runs
    at (16+16)² — the bar-count-bucketed fast path.  Everything (compaction,
    sort, gather, inverse permutation) stays on device.  Jitted whole: the
    chunk loop otherwise dispatches ~50 chunk programs + eager glue ops per
    call (~10k dispatches over the study's 180 calls), pure host overhead."""
    N = b1.shape[0]
    b1, d1, m1 = _compact_rows(b1, d1, m1)
    b2, d2, m2 = _compact_rows(b2, d2, m2)
    r = jnp.maximum(jnp.sum(m1, axis=1), jnp.sum(m2, axis=1))
    order = jnp.argsort(-r)
    arrs = [jnp.take(x, order, axis=0) for x in (b1, d1, m1, b2, d2, m2)]
    outs = []
    for c in range(0, N, chunk):
        end = min(c + chunk, N)
        blks = []
        for v in arrs:
            blk = v[c:end]
            if end - c < chunk:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((chunk - (end - c), v.shape[1]), v.dtype)])
            blks.append(blk)
        outs.append(_wass_chunk_tiered(*blks)[: end - c])
    return jnp.take(jnp.concatenate(outs), jnp.argsort(order))


@partial(jax.jit, static_argnames=("K", "n_win_max"))
def _pair_select_program(dist, aud_use_idx, aud_n_win, K: int, n_win_max: int):
    """Select the EEG windows at the AUDIO program's index set — one shared
    linspace over n_pair = min(eeg, audio) windows for both sides (reference
    tda_eeg_audio_comparison.py:72-80; the audio program was called with
    n_win_cap = the EEG window count, so its n_win is already n_pair).

    Returns the selection batch-first (B, 5·K, n, n) so a dp-sharded batch
    axis survives downstream chunking."""
    B = dist.shape[0]
    n_pair = aud_n_win.astype(jnp.int32)
    use_idx = jnp.clip(aud_use_idx, 0, n_win_max - 1)
    k = jnp.arange(K, dtype=jnp.int32)
    kmask = k[None, :] < jnp.minimum(n_pair, K)[:, None]          # (B, K)
    n = dist.shape[-1]
    sel_dm = jnp.take_along_axis(
        dist, use_idx[:, None, :, None, None], axis=2)            # (B,5,K,n,n)
    return sel_dm.reshape(B, N_BANDS * K, n, n), kmask, n_pair


@partial(jax.jit, static_argnames=("cfg", "K", "n_win_max"))
def _pair_distance_program(eeg, n_samples, aud_use_idx, aud_n_win,
                           cfg: PipelineConfig, K: int, n_win_max: int):
    """Banded windows → select the ≤K paired windows → correlation distance.

    The paired index set is a linspace over n_pair = min(eeg, audio) window
    COUNTS (reference tda_eeg_audio_comparison.py:72-80) — it never depends
    on signal content — so the correlation/distance matmuls run on the K
    selected windows only, not all n_win_max (~6× less corr work than
    selecting after eeg_distance_program).  Same outputs as
    _pair_select_program on the selected windows, bit for bit."""
    B = eeg.shape[0]
    wins, _ = _banded_windows(eeg, n_samples, cfg, n_win_max)
    use_idx = jnp.clip(aud_use_idx, 0, n_win_max - 1)
    sel_w = jnp.take_along_axis(
        wins, use_idx[:, None, :, None, None], axis=2)    # (B,5,K,C,win)
    corr = tgeo.correlation_matrix(sel_w)
    dist = tgeo.correlation_to_distance(corr, cfg.distance_method)
    n_pair = aud_n_win.astype(jnp.int32)
    k = jnp.arange(K, dtype=jnp.int32)
    kmask = k[None, :] < jnp.minimum(n_pair, K)[:, None]          # (B, K)
    n = dist.shape[-1]
    return dist.reshape(B, N_BANDS * K, n, n), kmask, n_pair


@jax.jit
def window_count_program(n_samples, win: int, step: int, t_pad: int):
    """Window count from recording length alone — matches _banded_windows'
    wmask sum (window w valid iff w·step + win ≤ n_samples)."""
    n = jnp.minimum(n_samples.astype(jnp.int32), t_pad)
    return jnp.maximum((n - win) // step + 1, 0)


def _h0_pack(out):
    d = jnp.where(jnp.isfinite(out["h0_deaths"]), out["h0_deaths"], 0.0)
    return jnp.zeros_like(d), d, out["h0_mask"]


def _h1_pack(out):
    b = out["births"]
    d = out["deaths"]
    m = out["h1_mask"] & jnp.isfinite(d)
    return b, jnp.where(m, d, 0.0), m


@partial(jax.jit, static_argnames=("K",))
def _comparison_stats_program(w_h0, w_h1, w_h1_mis, e_feats, a_feats,
                              kmask, a_degen, mis_degen,
                              n_win_e, mis_n_win, K: int):
    """Window-mean Wasserstein + Spearman feature correlations → (B,5) stats.

    Degenerate Takens windows (< 3 embedded points) are EXCLUDED from the
    Wasserstein window means and from the feature time series — the
    reference skips them entirely (`if len(pc) < 3: continue`,
    tda_eeg_audio_comparison.py:90-91).  a_degen/mis_degen: (B, 5, K) bool.
    """
    from ..ops import stats as dstats

    B = kmask.shape[0]
    k = jnp.arange(K, dtype=jnp.float32)
    km_b = jnp.repeat(kmask[:, None, :], N_BANDS, 1)              # (B,5,K)
    pm = (km_b & ~a_degen).reshape(-1)
    mis_pm = (km_b
              & (k[None, None, :] <
                 jnp.minimum(jnp.minimum(n_win_e, mis_n_win), K)[:, None, None])
              & ~mis_degen).reshape(-1)

    def wmean(w, m):
        w = w.reshape(B, N_BANDS, K)
        m = m.reshape(B, N_BANDS, K)
        return jnp.sum(jnp.where(m, w, 0.0), -1) / jnp.maximum(jnp.sum(m, -1), 1)

    # Spearman temporal correlations on 5 H1 features
    # (reference tda_eeg_audio_comparison.py:98-114)
    FEAT_IDX = jnp.asarray([6, 9, 10, 8, 0])  # mean/total persistence,
    # entropy, max persistence, n_features
    ef = e_feats.reshape(B, N_BANDS, K, 2, 11)[:, :, :, 1, :]
    af = a_feats.reshape(B, N_BANDS, K, 2, 11)[:, :, :, 1, :]
    e_ts = jnp.moveaxis(ef[..., FEAT_IDX], -1, 2)                 # (B,5,5f,K)
    a_ts = jnp.moveaxis(af[..., FEAT_IDX], -1, 2)
    km3 = jnp.broadcast_to((km_b & ~a_degen)[:, :, None, :], e_ts.shape)
    r, p = dstats.spearmanr(a_ts.reshape(-1, K), e_ts.reshape(-1, K),
                            km3.reshape(-1, K))
    n_valid = jnp.sum(km_b & ~a_degen, -1)                        # (B,5)

    def mstd(x):    # np.std over the kept windows only
        nv = jnp.maximum(jnp.sum(km3, -1), 1)
        mu = jnp.sum(jnp.where(km3, x, 0.0), -1) / nv
        return jnp.sqrt(
            jnp.sum(jnp.where(km3, (x - mu[..., None]) ** 2, 0.0), -1) / nv)

    std_ok = (mstd(a_ts) > 1e-10) & (mstd(e_ts) > 1e-10)
    ok = (n_valid[:, :, None] >= 5) & std_ok
    r = jnp.where(ok, r.reshape(B, N_BANDS, 5), 0.0)
    p = jnp.where(ok, p.reshape(B, N_BANDS, 5), 1.0)
    return dict(w_h0=wmean(w_h0, pm), w_h1=wmean(w_h1, pm),
                w_h1_mis=wmean(w_h1_mis, mis_pm), corr_r=r, corr_p=p)


@partial(jax.jit, static_argnames=("thresh", "na_max", "h1_max", "step_budget"))
def _diagram_chunk_program(dm, n_pts, thresh: float, na_max: int,
                           h1_max: int, step_budget: int):
    """(B, m, n, n) batch-first chunk → audio_window_diagrams outputs
    reshaped back to (B, m, ...)."""
    B, m = dm.shape[:2]
    out = audio_window_diagrams(dm.reshape(B * m, *dm.shape[2:]),
                                n_pts.reshape(B * m), thresh=thresh,
                                na_max=na_max, h1_max=h1_max,
                                step_budget=step_budget)
    return {k: v.reshape(B, m, *v.shape[1:]) for k, v in out.items()}


def _diagrams_chunked_host(dm, n_pts, thresh, chunk, na_max, step_budget):
    """Python-chunked diagram computation over DEVICE-RESIDENT arrays.

    dm: (B, M, n, n) batch-first; n_pts: (B, M).  Each chunk slices the
    WINDOW axis (the batch axis is preserved end-to-end), so a dp-sharded
    batch stays local to its devices — the multi-chip path runs these
    chunks without any GSPMD resharding.  `chunk` counts windows·batch:
    chunk_m = chunk // B windows per dispatch, matching the single-device
    workspace bound.  Each chunk is one async dispatch of a small cached
    executable; outputs stay on device (no host round trips).  Chosen over
    a single lax.map mega-program because hour-long monolithic compiles
    crashed the remote TPU worker — per-chunk executables compile in
    minutes and cache individually.

    Returns flat (B·M, ...) arrays (window-major within recording).
    """
    B, M = dm.shape[:2]
    n = dm.shape[-1]
    chunk_m = max(chunk // B, 1)
    outs = []
    for c in range(0, M, chunk_m):
        end = min(c + chunk_m, M)
        blk = dm[:, c:end]
        npts = n_pts[:, c:end].astype(jnp.int32)
        if end - c < chunk_m:
            pad = chunk_m - (end - c)
            far = (1.0 - jnp.eye(n)) * (thresh + 1.0)
            blk = jnp.concatenate(
                [blk, jnp.broadcast_to(far, (B, pad, n, n)).astype(blk.dtype)],
                axis=1)
            npts = jnp.concatenate(
                [npts, jnp.full((B, pad), n, jnp.int32)], axis=1)
        outs.append(_diagram_chunk_program(blk, npts, thresh=thresh,
                                           na_max=na_max, h1_max=na_max,
                                           step_budget=step_budget))
    cat = {k: jnp.concatenate([o[k] for o in outs], axis=1)[:, :M]
           for k in outs[0]}
    return {k: v.reshape(B * M, *v.shape[2:]) for k, v in cat.items()}


def audio_h1_program(audio, n_a, cfg: PipelineConfig = DEFAULT_CONFIG,
                     n_rs_max: int = 5900, n_win_max: int = 90, K: int = 15,
                     aud_chunk: int = 64, n_win_cap=None):
    """Audio → per-band H1 diagrams on the ≤K subsampled windows.

    The mismatched-control getter (reference matched_vs_mismatched.py:35-63)
    as a device program: resample → envelope → band filter → window →
    subsample → τ → Takens → Rips H1.  The driver computes each unique
    mismatch recording ONCE through this and reuses the diagrams across all
    of that recording's ~16 pairings — the reference recomputes them per
    pairing (matched_vs_mismatched.py:117-141).

    Returns (b, d, m) H1 arrays (B·5·K, H), n_win (B,), degen (B, 5, K).
    """
    aud = audio_takens_program(audio, n_a, cfg, n_rs_max, n_win_max, K,
                               n_win_cap=n_win_cap)
    P = cfg.max_takens_points
    B = audio.shape[0]
    out = _diagrams_chunked_host(
        aud["dm"].reshape(B, N_BANDS * K, P, P),
        aud["n_pts"].reshape(B, N_BANDS * K),
        cfg.max_edge_length, aud_chunk, 96, 8192)
    b, d, m = _h1_pack(out)
    return dict(h1_b=b, h1_d=d, h1_m=m, n_win=aud["n_win"],
                degen=aud["n_pts"] < 3, overflow=out["overflow"])


def comparison_program(eeg, n_e, audio, n_a, mis_h1, mis_n_win, mis_degen,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       n_win_max: int = 90, n_rs_max: int = 5900,
                       K: int = 15, eeg_chunk: int = 256,
                       aud_chunk: int = 64):
    """EEG↔audio comparison + matched/mismatched control for one batch.

    Device-resident staged pipeline: EEG → banded distance windows; own
    audio → Takens diagrams; window-paired Wasserstein W_H0/W_H1
    (ε-annealed device Sinkhorn, persim cost semantics); Spearman
    correlations of the five tracked H1 features.  Replaces the
    per-recording host loops of reference
    scripts/tda_eeg_audio_comparison.py:45-124 and
    scripts/matched_vs_mismatched.py:35-95.

    mis_h1 = (b, d, m) H1 diagram arrays (B·5·K, H) of each recording's
    mismatch audio, precomputed ONCE per unique opposite-condition file via
    `audio_h1_program` and gathered per batch by the driver; mis_n_win (B,),
    mis_degen (B, 5, K) accompany them.

    All intermediates (distance matrices, diagrams) remain jax Arrays on
    the device; only the (B, 5)-shaped outputs are read back by the caller.
    Dispatches are async, so the host loop costs ~nothing.
    """
    B = eeg.shape[0]
    n_win_e = window_count_program(n_e, cfg.win_samples, cfg.step_samples,
                                   eeg.shape[-1])
    # own audio subsamples over n_pair = min(audio, eeg); ONE index set is
    # drawn inside the audio program and reused for the EEG side below
    # (reference tda_eeg_audio_comparison.py:72-80).  The EEG side then
    # filters/windows/correlates ONLY the selected windows — the index set
    # depends on window counts alone, never on signal content
    aud = audio_takens_program(audio, n_a, cfg, n_rs_max, n_win_max, K,
                               n_win_cap=n_win_e)

    sel_e, kmask, n_pair = _pair_distance_program(
        eeg, n_e, aud["use_idx"], aud["n_win"], cfg, K, n_win_max)
    n = sel_e.shape[-1]
    # EEG H1 diagrams: na_max 96 (measured ≤ 49 visible bars on study
    # windows; overflow still flags) — the smaller pad width shrinks the
    # Sinkhorn cost matrices below by ~1.4x
    e_out = _diagrams_chunked_host(
        sel_e, jnp.full(sel_e.shape[:2], n, jnp.int32),
        cfg.max_edge_length, eeg_chunk, 96, 4096)

    P = cfg.max_takens_points
    a_out = _diagrams_chunked_host(
        aud["dm"].reshape(B, N_BANDS * K, P, P),
        aud["n_pts"].reshape(B, N_BANDS * K),
        cfg.max_edge_length, aud_chunk, 96, 8192)

    _, e0d, e0m = _h0_pack(e_out)
    e_ovf = e_out["overflow"].reshape(B, -1).any(axis=1)
    return _comparison_tail(e0d, e0m, _h1_pack(e_out), e_out["features"],
                            e_ovf, aud, a_out, kmask, n_win_e, n_pair,
                            mis_h1, mis_n_win, mis_degen, K, B)


def _comparison_tail(e0d, e0m, e1, e_feats, e_ovf, aud, a_out, kmask,
                     n_win_e, n_pair, mis_h1, mis_n_win, mis_degen, K, B):
    """Wasserstein + window statistics shared by comparison_program (EEG
    diagrams computed in-call) and comparison_from_bank (EEG diagrams
    gathered from the features stage's bank)."""
    _, a0d, a0m = _h0_pack(a_out)
    w_h0 = _wass_h0_exact_chunked(e0d, e0m, a0d, a0m)
    a1 = _h1_pack(a_out)
    # ONE tiered Sinkhorn call for matched + mismatched pairs: the combined
    # size-sort packs both sets' sparse tails into shared narrow-tier chunks
    # and halves the dispatch count (VERDICT r3 next #1 (ii))
    n_pairs = e1[0].shape[0]
    w_both = _wass_sinkhorn_tiered(
        *(jnp.concatenate([x, x]) for x in e1),
        jnp.concatenate([a1[0], mis_h1[0]]),
        jnp.concatenate([a1[1], mis_h1[1]]),
        jnp.concatenate([a1[2], mis_h1[2]]))
    w_h1, w_mis = w_both[:n_pairs], w_both[n_pairs:]

    out = _comparison_stats_program(
        w_h0, w_h1, w_mis, e_feats,
        a_out["features"], kmask, aud["n_pts"] < 3, mis_degen,
        n_win_e, mis_n_win, K)
    # per-band degenerate-Takens flag over the valid selected windows — the
    # control driver uses it (with host-side window counts) to detect
    # recordings whose positional pairing deviates from the reference
    # control's compaction semantics and must be redone exactly
    a_degen = jnp.any((aud["n_pts"] < 3) & aud["wmask"][:, None, :], axis=-1)
    # per-RECORDING overflow (diagram pad width / step budget exceeded on
    # any of its windows): the driver reroutes flagged recordings through
    # the staged path, whose run_tda recomputes overflow windows on the
    # exact host engine (never silently keeps a truncated diagram)
    ovf_rec = e_ovf | a_out["overflow"].reshape(B, -1).any(axis=1)
    out.update(tau=aud["tau"], n_pair=jnp.minimum(n_pair, K),
               a_degen=a_degen, overflow=ovf_rec)
    return out


@jax.jit
def _bank_take(leaf, gidx):
    return jnp.take(leaf, gidx, axis=0)


def comparison_from_bank(e_bank, gidx, n_e, audio, n_a, mis_h1, mis_n_win,
                         mis_degen, cfg: PipelineConfig = DEFAULT_CONFIG,
                         n_win_max: int = 90, n_rs_max: int = 5900,
                         K: int = 15, aud_chunk: int = 64,
                         t_eeg_pad: int = 5800):
    """comparison_program with the EEG side GATHERED from the features
    stage's per-window diagram bank instead of recomputed.

    The comparison's paired window selection (linspace over
    min(n_eeg, n_audio) windows — reference tda_eeg_audio_comparison.py:
    72-80) need not be a subset of the features stage's md5 sample, so
    the driver appends it to every bank row as K_CMP mask=False UNION
    columns (computed but excluded from the feature aggregate —
    models/study.py _paired_comp_indices) and builds `gidx` — flat
    (B·5·K,) int32 indices into those columns — falling back to
    comparison_program only for batches with a recording missing from
    the bank.  Skips the comparison stage's second EEG corr→dist→H1 pass.

    e_bank: dict of flat (R, ·) device leaves (h1_b/h1_d/h1_m pad width
    128, h0_d/h0_m width n−1, feats (·, 2, 11)) from
    eeg_feature_program(return_bank=True), R = bank_rows · 5 · K_feat.

    Exactness: bank diagrams ride na_max/h1_max 128 while this path's
    in-call EEG diagrams ride 96; gathered H1 rows are SLICED back to 96
    and any bar beyond flags the recording's `overflow` — the same
    recordings the in-call path would overflow-flag at 96 — so both
    paths produce identical kept values and identical exact-redo sets.
    """
    B = audio.shape[0]
    n_win_e = window_count_program(n_e, cfg.win_samples, cfg.step_samples,
                                   t_eeg_pad)
    aud = audio_takens_program(audio, n_a, cfg, n_rs_max, n_win_max, K,
                               n_win_cap=n_win_e)
    P = cfg.max_takens_points
    a_out = _diagrams_chunked_host(
        aud["dm"].reshape(B, N_BANDS * K, P, P),
        aud["n_pts"].reshape(B, N_BANDS * K),
        cfg.max_edge_length, aud_chunk, 96, 8192)
    g = {k: _bank_take(v, gidx) for k, v in e_bank.items()}
    # Normalize the H1 rows to this path's canonical 96 width.  Narrower
    # banks (feature_na_max < 96) are zero-PADDED rather than consumed
    # as-is: downstream Sinkhorn padding tiers derive from row width, so a
    # 64-wide row would produce a differently-shaped (1-ULP different)
    # reduction than comparison_program's.  Bar counts beyond a narrow
    # bank's width cannot hide here — the kernel flags bar-count overflow
    # at its h1_max (ops/homology_h1.py _h1_extract) and the driver drops
    # overflowed recordings from the bank (models/study.py).
    Wb = g["h1_m"].shape[1]
    if Wb < 96:
        e1 = tuple(jnp.pad(g[k], ((0, 0), (0, 96 - Wb)))
                   for k in ("h1_b", "h1_d", "h1_m"))
        e_ovf = jnp.zeros((B,), bool)
    else:
        e1 = (g["h1_b"][:, :96], g["h1_d"][:, :96], g["h1_m"][:, :96])
        e_ovf = g["h1_m"][:, 96:].reshape(B, -1).any(axis=1)
    return _comparison_tail(g["h0_d"], g["h0_m"], e1, g["feats"], e_ovf,
                            aud, a_out, aud["wmask"],
                            n_win_e, aud["n_win"].astype(jnp.int32),
                            mis_h1, mis_n_win, mis_degen, K, B)


# ─────────────────────────────────────────────────────────────────────────────
# Output packing — one host readback per stage, not one per output leaf
# ─────────────────────────────────────────────────────────────────────────────
# On this deployment a host↔device transfer costs ~40 ms of round-trip
# latency regardless of size; reading the comparison program's 8 output
# leaves per batch serially costs ~0.3 s × 90 batches ≈ 30 s of pure
# latency.  Each batch's outputs are therefore packed into ONE flat f32
# vector on device; the driver concatenates the per-batch vectors on device
# and reads the whole stage back in a single transfer.

_CMP_FIELDS = (("w_h0", N_BANDS), ("w_h1", N_BANDS), ("w_h1_mis", N_BANDS),
               ("corr_r", N_BANDS * 5), ("corr_p", N_BANDS * 5),
               ("tau", N_BANDS), ("n_pair", 1), ("a_degen", N_BANDS),
               ("overflow", 1))


@jax.jit
def pack_comparison_outputs(out):
    """comparison_program output dict → (B·77,) f32 vector (int/bool fields
    are exact in f32 at study magnitudes: τ ≤ 125, n_pair ≤ 15)."""
    parts = [jnp.ravel(out[k]).astype(jnp.float32) for k, _ in _CMP_FIELDS]
    return jnp.concatenate(parts)


def unpack_comparison_outputs(flat: np.ndarray, B: int) -> dict:
    """Host-side inverse of pack_comparison_outputs for one batch."""
    out = {}
    off = 0
    for k, width in _CMP_FIELDS:
        n = B * width
        v = flat[off:off + n]
        out[k] = v.reshape(B, width) if width > 1 else v
        off += n
    out["corr_r"] = out["corr_r"].reshape(B, N_BANDS, 5)
    out["corr_p"] = out["corr_p"].reshape(B, N_BANDS, 5)
    out["a_degen"] = out["a_degen"] > 0.5
    out["overflow"] = out["overflow"] > 0.5
    return out


@jax.jit
def pack_feature_outputs(agg, diag, ovf, bank_ovf=None):
    """eeg_feature_program outputs → one flat f32 vector per batch."""
    parts = [jnp.ravel(agg).astype(jnp.float32),
             jnp.ravel(diag).astype(jnp.float32),
             jnp.ravel(ovf).astype(jnp.float32)]
    if bank_ovf is not None:
        parts.append(jnp.ravel(bank_ovf).astype(jnp.float32))
    return jnp.concatenate(parts)


def unpack_feature_outputs(flat: np.ndarray, B: int, has_bank: bool = False):
    """(agg (B,5,2,11,2), diag (B,5,8), ovf (B,) bool[, bank_ovf (B,) bool])
    from the packed vector."""
    n_agg = B * N_BANDS * 2 * 11 * 2
    n_dg = B * N_BANDS * 8
    agg = flat[:n_agg].reshape(B, N_BANDS, 2, 11, 2)
    diag = flat[n_agg:n_agg + n_dg].reshape(B, N_BANDS, 8)
    ovf = flat[n_agg + n_dg:n_agg + n_dg + B] > 0.5
    if has_bank:
        off = n_agg + n_dg + B
        return agg, diag, ovf, flat[off:off + B] > 0.5
    return agg, diag, ovf


# ─────────────────────────────────────────────────────────────────────────────
# Audio branch
# ─────────────────────────────────────────────────────────────────────────────


@partial(jax.jit, static_argnames=("cfg", "n_out_max", "n_win_max", "max_windows"))
def audio_takens_program(audio: jnp.ndarray, n_samples: jnp.ndarray,
                         cfg: PipelineConfig = DEFAULT_CONFIG,
                         n_out_max: int = 5800, n_win_max: int = 90,
                         max_windows: int = 15,
                         n_win_cap: jnp.ndarray | None = None):
    """(B, T_audio_pad) padded audio → per-band Takens distance matrices.

    Pipeline (reference scripts/tda_eeg_audio_comparison.py:53-92):
    resample 44.1 kHz → 250 Hz, Hilbert envelope, 5-band filter, 1 s windows,
    even subsample to ≤ max_windows, τ from first window, Takens embedding,
    min-max normalize, pairwise distances (padded points > thresh).

    n_win_cap: optional (B,) int — when given, the window count is first
    capped at min(own, cap).  The comparison driver passes the EEG window
    count here so ONE linspace index set over n = min(n_audio, n_eeg) is
    drawn and reused for both sides, exactly the reference's paired
    selection (tda_eeg_audio_comparison.py:72-80).  Left None for the
    mismatched-control audio, which the reference subsamples over its own
    window count (matched_vs_mismatched.py:50-55).

    Returns dict with dm (B, 5, max_windows, P, P), point-valid counts,
    window masks, τ per band, and the drawn index set `use_idx` (B, K) —
    callers selecting the paired EEG windows must reuse it verbatim.
    """
    h, up, down = tsig.design_resample_poly_filter(cfg.fs_eeg, cfg.fs_audio)
    a_rs, n_rs = tsig.resample_poly_device(audio, n_samples, n_out_max, h, up, down)
    lp = jnp.asarray(tsig.design_envelope_lowpass(cfg.fs_eeg))
    hb = jnp.asarray(tsig.design_hilbert_fir())
    t_ids = jnp.arange(n_out_max)
    env = tsig.hilbert_envelope(a_rs, lp, hb,
                                mask=(t_ids[None, :] < n_rs[:, None]).astype(a_rs.dtype))
    bank = jnp.asarray(tsig.design_band_fir_bank(
        cfg.fs_eeg, cfg.filter_order, cfg.fir_numtaps))
    env_b = tsig.bandpass_bank(env, bank)                     # (B, 5, T)
    win, step = cfg.win_samples, cfg.step_samples
    wins = tsig.sliding_windows(env_b, n_win_max, win, step)  # (B, 5, W, win)
    n_win = jnp.maximum((n_rs - win) // step + 1, 0)          # (B,)
    if n_win_cap is not None:
        n_win = jnp.minimum(n_win, n_win_cap)

    # even subsample to ≤ max_windows: idx = linspace(0, n_win-1, max_windows)
    # (reference tda_eeg_audio_comparison.py:77-80)
    k = jnp.arange(max_windows, dtype=jnp.float32)
    nw = jnp.maximum(n_win.astype(jnp.float32), 1.0)[:, None]
    use_all = n_win[:, None] <= max_windows
    idx_lin = (k[None, :] * (nw - 1.0) / (max_windows - 1)).astype(jnp.int32)
    idx_seq = jnp.minimum(k.astype(jnp.int32)[None, :], n_win[:, None] - 1)
    use_idx = jnp.where(use_all, idx_seq, idx_lin)            # (B, K)
    use_idx = jnp.clip(use_idx, 0, n_win_max - 1)
    kmask = k[None, :] < jnp.minimum(n_win, max_windows)[:, None]

    sel = jnp.take_along_axis(wins, use_idx[:, None, :, None], axis=2)  # (B,5,K,win)

    # τ from the first selected window (= window 0) per band
    tau = tsig.autocorr_tau(sel[:, :, 0, :], win // 2)        # (B, 5)
    P = cfg.max_takens_points
    tau_b = jnp.broadcast_to(tau[:, :, None], sel.shape[:3])
    pts, pmask = tsig.takens_embed(sel, tau_b, cfg.takens_dim,
                                   cfg.takens_subsample, P)
    ptsn = tsig.minmax_normalize_points(pts, pmask)
    dm = tgeo.pairwise_distances(ptsn, pmask,
                                 pad_value=cfg.max_edge_length + 1.0)
    n_pts = jnp.sum(pmask, axis=-1)                           # (B, 5, K)
    return dict(dm=dm, n_pts=n_pts, wmask=kmask, tau=tau, n_win=n_win,
                use_idx=use_idx, envelope=env, n_rs=n_rs)


# Stored-column VMEM arena cap at n=124 (96 × 240 × 128 × 4 B ≈ 11.8 MB —
# comfortably inside VMEM; measured perf-neutral vs 80 at 0.38 ms/window).
# 96 covers every audio creator count observed across the full study
# (3 windows in 108k exceeded the previous cap of 80 and went through the
# staged overflow redo).
PALLAS_NA_MAX = 96
# Routing defaults live in ..tuning: measurement-written tuning.json with
# env-var overrides, conservative (bitset) when unmeasured — the round's
# official bench must never ride an unmeasured kernel.  The A/B battery
# (scratch/measure_r4.sh → scratch/write_tuning.py) flips them only after
# the flipped full-study bench beats the default end-to-end.
from ..tuning import PALLAS_MIN_N


def h1_backend_auto(n: int) -> str:
    """Route per shape+platform: the per-window Pallas kernel wins 14x at
    the audio n=124 shape (0.41 vs 5.7 ms/window measured on v5e); below
    the measured crossover (tuning.PALLAS_MIN_N, set by the on-hardware
    sweep scratch/bench_crossover.py) the batched XLA lockstep serves the
    small-n EEG clouds.  Off-TPU both fall back to the portable XLA
    kernel."""
    import jax

    if jax.default_backend() != "tpu":
        return "bitset"
    return "pallas" if n >= PALLAS_MIN_N else "bitset"


def h1_diagrams_routed(dm, n_pts=None, *, n: int, thresh: float,
                       na_max: int, h1_max: int, step_budget: int,
                       backend: str = "auto"):
    """THE routing point for every H1 dispatch in the package.

    Every caller (window_tda_features, audio_window_diagrams,
    homology_exec.run_tda) goes through here so the backend resolution,
    the off-TPU fallback and the Mosaic arena clamp can never diverge
    between pipeline stages.  The Mosaic kernel's step budget counts
    PER-WINDOW reduction steps (the lockstep's counts the chunk's
    max-chain), so it is floored at its measured default (8192) —
    the A/B battery benchmarks it at that budget, and a smaller
    production budget would overflow windows the A/B never saw.
    """
    if backend == "auto":
        backend = h1_backend_auto(n)
    if backend == "pallas":
        import jax

        if jax.default_backend() != "tpu":
            # Mosaic kernels only compile for TPU; honor the intent with
            # the portable kernel rather than failing obscurely
            backend = "bitset"
    if n_pts is not None:
        n_pts = n_pts.astype(jnp.int32)
    if backend == "pallas":
        from ..ops.homology_pallas import h1_diagrams_pallas

        return h1_diagrams_pallas(
            dm, n_pts, n=n, thresh=thresh,
            na_max=min(na_max, PALLAS_NA_MAX), h1_max=h1_max,
            step_budget=max(step_budget, 8192))
    return h1_diagrams(dm, n_pts, n=n, thresh=thresh, na_max=na_max,
                       h1_max=h1_max, step_budget=step_budget)


@partial(jax.jit, static_argnames=("thresh", "na_max", "h1_max", "step_budget",
                                   "backend"))
def audio_window_diagrams(dm: jnp.ndarray, n_pts: jnp.ndarray,
                          thresh: float = 2.0, na_max: int = 96,
                          h1_max: int = 96, step_budget: int = 8192,
                          backend: str = "auto"):
    """(B, P, P) Takens distance matrices → H0/H1 diagrams + features.

    Windows with < 3 valid points get the reference's degenerate [[0, 0]]
    sentinel diagrams (scripts/utils.py:125-126).

    backend: "auto" | "pallas" | "bitset" — "auto" resolves per platform at
    trace time (single-platform processes; tests force one platform first).
    """
    n = dm.shape[-1]
    out = h1_diagrams_routed(dm, n_pts, n=n, thresh=thresh, na_max=na_max,
                             h1_max=h1_max, step_budget=step_budget,
                             backend=backend)
    degenerate = n_pts < 3
    # H0: essential = components among valid points = n_pts − n_tree
    n_comp = (n_pts - out["n_tree"]).astype(jnp.int32)
    h0_deaths = out["h0_deaths"]
    h0_mask = out["h0_mask"]
    # degenerate → single (0,0) bar
    h0_deaths = jnp.where(degenerate[:, None], 0.0, h0_deaths)
    h0_mask = jnp.where(degenerate[:, None],
                        jnp.arange(h0_deaths.shape[-1])[None, :] == 0, h0_mask)
    n_comp = jnp.where(degenerate, 0, n_comp)
    f_h0 = diagram_features(jnp.zeros_like(h0_deaths), h0_deaths, h0_mask, n_comp)

    births = jnp.where(degenerate[:, None], 0.0, out["births"])
    deaths = jnp.where(degenerate[:, None], 0.0, out["deaths"])
    h1_mask = jnp.where(degenerate[:, None],
                        jnp.arange(births.shape[-1])[None, :] == 0, out["mask"])
    fin = h1_mask & jnp.isfinite(deaths)
    n_ess1 = jnp.where(degenerate, 0, out["n_essential"])
    f_h1 = diagram_features(births, jnp.where(fin, deaths, 0.0), fin, n_ess1)
    return dict(
        h0_deaths=h0_deaths, h0_mask=h0_mask, n_comp=n_comp,
        births=births, deaths=deaths, h1_mask=h1_mask, fin_mask=fin,
        features=jnp.stack([f_h0, f_h1], axis=1), overflow=out["overflow"],
    )
