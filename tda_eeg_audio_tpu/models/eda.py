"""Exploratory data analysis stage — the TPU-native rebuild of
notebooks/0_eda.ipynb (reference component C35, SURVEY §2.1).

Reproduces the notebook's deliverables as structured artifacts instead of
inline plots: file inventory + subject×condition coverage, duration stats,
per-band Welch power (device FFT op), slow-vs-fast RMS band power, and
hierarchical clustering of subjects on band-power profiles (host scipy
linkage — tiny input, not TPU-shaped).
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..config import FREQ_BANDS, GOOD_ELECTRODES
from ..ops import signal as tsig

BAND_NAMES = list(FREQ_BANDS)


def _load_eda_batch(dataset, idxs, t_pad):
    """(eeg (B, 47, t_pad) f32, ns_e (B,), metas) for host datasets AND the
    HBM-resident DeviceStore (io.device_store) — the store has no per-file
    load(); its batch() slices are already electrode-selected and padded
    (ADVICE r2: `tda eda` on the default TPU store raised AttributeError)."""
    if hasattr(dataset, "batch"):
        eeg, _, ns_e, _, metas = dataset.batch(idxs)
        eeg = np.asarray(eeg)
        if eeg.shape[-1] > t_pad:
            eeg = eeg[:, :, :t_pad]
        return eeg, np.minimum(np.asarray(ns_e), t_pad), metas
    eegs, ns_e, metas = [], [], []
    for i in idxs:
        rec = dataset.load(i)
        eeg = rec["eeg_raw"][list(GOOD_ELECTRODES)]
        e = np.zeros((len(GOOD_ELECTRODES), t_pad), np.float32)
        n_e = min(eeg.shape[1], t_pad)
        e[:, :n_e] = eeg[:, :n_e]
        eegs.append(e)
        ns_e.append(n_e)
        metas.append(rec)
    return np.stack(eegs), np.asarray(ns_e), metas


def run_eda(dataset, cfg, results_dir=None, eeg_batch: int = 16,
            t_pad: int = 5800, verbose: bool = True) -> dict:
    """Full EDA pass over a dataset → eda_summary.json-shaped dict."""
    fs = cfg.fs_eeg
    inventory = []
    coverage = defaultdict(lambda: {"slow": 0, "fast": 0})
    band_power = defaultdict(list)        # (subject, condition) → rows (5,)
    durations = {"slow": [], "fast": []}
    psd_sum = {"slow": None, "fast": None}
    psd_n = {"slow": 0, "fast": 0}
    waveforms: dict[str, np.ndarray] = {}
    freqs = None

    n = len(dataset)
    for b0 in range(0, n, eeg_batch):
        idxs = list(range(b0, min(b0 + eeg_batch, n)))
        eegs, ns_e, metas = _load_eda_batch(dataset, idxs, t_pad)
        x = jnp.asarray(eegs)
        # Welch PSD per channel on device, then mean channel power per band.
        # Segments are masked by each recording's true length — averaging the
        # zero-padded tail would bias fast (shorter) recordings low.
        freqs, pxx = tsig.welch_psd(
            x, fs=fs, nperseg=min(fs, t_pad),
            n=jnp.asarray(np.array(ns_e))[:, None])
        freqs = np.array(freqs)
        pxx = np.array(pxx)                                  # (B, C, F)
        for bi, (i, rec) in enumerate(zip(idxs, metas)):
            if rec.get("failed"):      # store-staged corrupt files are zeroed
                continue
            subj, cond = rec["subject"], rec["condition"]
            dur = ns_e[bi] / fs
            # channel-mean PSD accumulators + one sample waveform per
            # condition for the EDA figures (notebook 0 plots)
            m = pxx[bi].mean(0)
            psd_sum[cond] = m if psd_sum[cond] is None else psd_sum[cond] + m
            psd_n[cond] += 1
            if cond not in waveforms:
                waveforms[cond] = np.array(eegs[bi][0, : ns_e[bi]])
            inventory.append(dict(
                filename=rec["filename"], subject=subj, condition=cond,
                n_samples=int(ns_e[bi]), duration_sec=float(dur)))
            coverage[subj][cond] += 1
            durations[cond].append(dur)
            bp = []
            for band in BAND_NAMES:
                lo, hi = FREQ_BANDS[band]
                sel = (freqs >= lo) & (freqs < hi)
                # integrate PSD over the band, mean over channels
                bp.append(float(np.trapezoid(
                    pxx[bi][:, sel], freqs[sel], axis=-1).mean()))
            band_power[(subj, cond)].append(bp)
        if verbose:
            print(f"  eda: {min(b0 + eeg_batch, n)}/{n}")

    # slow-vs-fast RMS band power comparison (notebook RMS cells)
    power_by_cond = {c: [] for c in ("slow", "fast")}
    for (subj, cond), rows in band_power.items():
        power_by_cond[cond].extend(rows)
    band_stats = {}
    for bd, band in enumerate(BAND_NAMES):
        s = np.array([r[bd] for r in power_by_cond["slow"]])
        f = np.array([r[bd] for r in power_by_cond["fast"]])
        band_stats[band] = dict(
            power_slow_mean=float(s.mean()) if len(s) else None,
            power_fast_mean=float(f.mean()) if len(f) else None,
            rms_slow=float(np.sqrt(s.mean())) if len(s) else None,
            rms_fast=float(np.sqrt(f.mean())) if len(f) else None)

    # hierarchical clustering of subjects on mean band-power profiles
    subj_profiles = defaultdict(list)
    for (subj, cond), rows in band_power.items():
        subj_profiles[subj].extend(rows)
    subjects = sorted(subj_profiles)
    cluster_order = subjects
    if len(subjects) >= 3:
        from scipy.cluster.hierarchy import linkage, leaves_list

        M = np.log10(np.stack([np.mean(subj_profiles[s], 0)
                               for s in subjects]) + 1e-20)
        M = (M - M.mean(0)) / (M.std(0) + 1e-12)
        Z = linkage(M, method="ward")
        cluster_order = [subjects[i] for i in leaves_list(Z)]

    out = dict(
        n_recordings=len(inventory),
        n_subjects=len(coverage),
        n_slow=sum(1 for r in inventory if r["condition"] == "slow"),
        n_fast=sum(1 for r in inventory if r["condition"] == "fast"),
        duration_stats={
            c: dict(mean=float(np.mean(d)), min=float(np.min(d)),
                    max=float(np.max(d)))
            for c, d in durations.items() if d},
        coverage={s: dict(v) for s, v in sorted(coverage.items())},
        band_power=band_stats,
        subject_cluster_order=cluster_order,
        inventory=inventory,
    )
    if results_dir:
        results_dir = Path(results_dir)
        results_dir.mkdir(parents=True, exist_ok=True)
        slim = {k: v for k, v in out.items() if k != "inventory"}
        (results_dir / "eda_summary.json").write_text(
            json.dumps(slim, indent=2))
        import csv
        with open(results_dir / "file_inventory.csv", "w", newline="") as fh:
            wr = csv.DictWriter(fh, fieldnames=list(inventory[0].keys()))
            wr.writeheader()
            wr.writerows(inventory)
        # EDA figures (reference paper/figures/eda_psd.png, eda_waveforms.png,
        # subject_distribution.png)
        from .study import _figures_module
        figures = _figures_module()
        if figures is None:
            return out
        if all(psd_n[c] for c in ("slow", "fast")):
            curves = {"freqs": freqs,
                      "slow": psd_sum["slow"] / psd_n["slow"],
                      "fast": psd_sum["fast"] / psd_n["fast"]}
            figures.eda_figures(curves, waveforms, fs, results_dir)
        figures.subject_distribution_figure(inventory, results_dir)
    return out
