"""A/B study: FIR band-pass (production) vs exact Butterworth filtfilt
(iir_scan) through the EEG chain END-TO-END — diagrams, the 11 features,
window-paired W_H1 against a fixed audio anchor, and the per-band Wilcoxon
signed-rank statistic on subject deltas.

SURVEY §7 "filter parity" mandates the FIR-for-Butterworth swap be gated at
the diagram/statistics level, not just the waveform (VERDICT r3 missing #3).
The deviation lives entirely in the EEG band-pass (the audio branch is
FIR under both impls), so the audio diagrams are computed ONCE and used as
a fixed Wasserstein anchor — this keeps the study CPU-tractable while
exercising the full filter → window → corr → dist → Rips → features →
Wasserstein → Wilcoxon chain on both filters.

This script MEASURES the deviations; tests/test_fir_parity.py gates them
with tolerances set from these measurements (+ margin).  Results recorded
in PARITY.md.

Run: python scratch/fir_parity_study.py [n_recordings=12] [K=8]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from tda_eeg_audio_tpu.runtime import force_cpu, enable_compilation_cache

force_cpu()
enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from tda_eeg_audio_tpu.config import DEFAULT_CONFIG, GOOD_ELECTRODES  # noqa: E402
from tda_eeg_audio_tpu.io.synthetic import SynthDataset  # noqa: E402


def eeg_chain(eeg, ns, impl, K):
    """Padded EEG batch → (B, 5, K) window diagrams + features, via the
    production programs with filter_impl=impl."""
    import dataclasses

    from tda_eeg_audio_tpu.models import programs as P

    cfg = dataclasses.replace(DEFAULT_CONFIG, filter_impl=impl)
    B = eeg.shape[0]
    n_win_max = 90
    dist, _, wmask = P.eeg_distance_program(
        jnp.asarray(eeg), jnp.asarray(ns), cfg, n_win_max)
    nw = np.asarray(wmask).sum(1)
    # first K valid windows per recording (deterministic, both impls agree)
    idx = np.stack([np.minimum(np.arange(K), nw[b] - 1) for b in range(B)])
    sel = jnp.take_along_axis(
        dist, jnp.asarray(idx)[:, None, :, None, None], axis=2)
    flat = sel.reshape(B * 5 * K, 47, 47)
    f, out = P.window_tda_features(flat, thresh=cfg.max_edge_length)
    return dict(feats=np.asarray(f).reshape(B, 5, K, 2, 11),
                births=np.asarray(out["births"]).reshape(B, 5, K, -1),
                deaths=np.asarray(out["deaths"]).reshape(B, 5, K, -1),
                mask=np.asarray(out["mask"]
                                & jnp.isfinite(out["deaths"])).reshape(
                                    B, 5, K, -1))


def main():
    n_rec = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ds = SynthDataset(n_subjects=max(n_rec // 2, 2), n_per_subject=1)
    n_rec = min(n_rec, len(ds))
    T = 5800
    eeg = np.zeros((n_rec, 47, T), np.float32)
    ns = np.zeros(n_rec, np.int32)
    subjects, conds = [], []
    for i in range(n_rec):
        rec = ds.load(i)
        e = rec["eeg_raw"][list(GOOD_ELECTRODES)]
        k = min(e.shape[1], T)
        eeg[i, :, :k] = e[:, :k]
        ns[i] = k
        subjects.append(rec["subject"])
        conds.append(rec["condition"])

    a = eeg_chain(eeg, ns, "fir", K)
    print("fir chain done", flush=True)
    b = eeg_chain(eeg, ns, "iir_scan", K)
    print("iir chain done", flush=True)

    # 1. 11-feature parity per window (H0 + H1)
    fa, fb = a["feats"], b["feats"]
    scale = np.abs(fb).mean(axis=(0, 2), keepdims=True) + 1e-9
    rel = np.abs(fa - fb) / np.maximum(np.abs(fb), scale)
    r = np.corrcoef(fa.ravel(), fb.ravel())[0, 1]
    print(f"features: pearson={r:.6f} rel-err median={np.median(rel):.3g} "
          f"p95={np.percentile(rel, 95):.3g} max={rel.max():.3g}")

    # 2. diagram-level: W_H1(fir vs iir) per window, relative to diagram mass
    from tda_eeg_audio_tpu.ops.wasserstein import (build_cost_matrix,
                                                   sinkhorn_cost)
    H = a["births"].shape[-1]
    N = n_rec * 5 * K
    pa = [jnp.asarray(x.reshape(N, H)) for x in
          (a["births"], np.where(a["mask"], a["deaths"], 0.0), a["mask"])]
    pb = [jnp.asarray(x.reshape(N, H)) for x in
          (b["births"], np.where(b["mask"], b["deaths"], 0.0), b["mask"])]
    w_ab = np.asarray(sinkhorn_cost(build_cost_matrix(*pa, *pb)))
    mass = np.maximum(
        (np.where(a["mask"], a["deaths"] - a["births"], 0.0)
         .reshape(N, H).sum(1)
         + np.where(b["mask"], b["deaths"] - b["births"], 0.0)
         .reshape(N, H).sum(1)) / 2.0, 1e-9)
    relw = w_ab / mass
    print(f"W_H1(fir,iir)/mass: median={np.median(relw):.3g} "
          f"p95={np.percentile(relw, 95):.3g} max={relw.max():.3g}")

    # 3. statistics level: Wilcoxon W on per-recording mean total
    # persistence deltas, fir vs iir — the stat consumers of the features
    from tda_eeg_audio_tpu.ops import stats as dstats
    for name, arr_a, arr_b in (("h1_totpers", fa[..., 1, 9], fb[..., 1, 9]),
                               ("h0_totpers", fa[..., 0, 9], fb[..., 0, 9])):
        ma, mb = arr_a.mean(-1), arr_b.mean(-1)      # (B, 5) recording means
        for bd in range(5):
            da = ma[:, bd] - ma[:, bd].mean()
            db = mb[:, bd] - mb[:, bd].mean()
            wa, p_a = dstats.wilcoxon(jnp.asarray(da[None], jnp.float32),
                                      jnp.ones((1, len(da)), bool))
            wb, p_b = dstats.wilcoxon(jnp.asarray(db[None], jnp.float32),
                                      jnp.ones((1, len(db)), bool))
            print(f"{name} band{bd}: mean fir={ma[:, bd].mean():.5f} "
                  f"iir={mb[:, bd].mean():.5f} "
                  f"relΔ={abs(ma[:, bd].mean() - mb[:, bd].mean()) / (abs(mb[:, bd].mean()) + 1e-9):.3g} "
                  f"wilcoxon p fir/iir = {float(np.asarray(p_a)[0]):.4f}/"
                  f"{float(np.asarray(p_b)[0]):.4f}")


if __name__ == "__main__":
    main()
