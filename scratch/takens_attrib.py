"""Sub-attribute audio_takens_program at production shapes: resample vs
envelope vs band filter vs windows/τ vs takens/distances."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.ops import signal as tsig
    from tda_eeg_audio_tpu.ops import geometry as tgeo

    print("devices:", jax.devices(), file=sys.stderr)
    Bp, K, NWM, NRS = 16, 15, 90, 5900
    T_A = 44100 * 24
    ds = SynthDataset(n_subjects=4, n_per_subject=4)
    audio = np.zeros((Bp, T_A), np.float32)
    ns_a = np.zeros(Bp, np.int32)
    for i in range(Bp):
        rec = ds.load(i)
        na = min(len(rec["audio"]), T_A)
        audio[i, :na] = rec["audio"][:na]
        ns_a[i] = na
    audio = jnp.asarray(audio)
    ns_a = jnp.asarray(ns_a)

    def chks(*xs):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in xs)

    def pipeline(upto):
        h, up, down = tsig.design_resample_poly_filter(cfg.fs_eeg, cfg.fs_audio)
        a_rs, n_rs = tsig.resample_poly_device(audio, ns_a, NRS, h, up, down)
        if upto == "resample":
            return chks(a_rs)
        lp = jnp.asarray(tsig.design_envelope_lowpass(cfg.fs_eeg))
        hb = jnp.asarray(tsig.design_hilbert_fir())
        t_ids = jnp.arange(NRS)
        env = tsig.hilbert_envelope(
            a_rs, lp, hb,
            mask=(t_ids[None, :] < n_rs[:, None]).astype(a_rs.dtype))
        if upto == "envelope":
            return chks(env)
        bank = jnp.asarray(tsig.design_band_fir_bank(
            cfg.fs_eeg, cfg.filter_order, cfg.fir_numtaps))
        env_b = tsig.bandpass_bank(env, bank)
        if upto == "bank":
            return chks(env_b)
        win, step = cfg.win_samples, cfg.step_samples
        wins = tsig.sliding_windows(env_b, NWM, win, step)
        n_win = jnp.maximum((n_rs - win) // step + 1, 0)
        k = jnp.arange(K, dtype=jnp.float32)
        nw = jnp.maximum(n_win.astype(jnp.float32), 1.0)[:, None]
        use_all = n_win[:, None] <= K
        idx_lin = (k[None, :] * (nw - 1.0) / (K - 1)).astype(jnp.int32)
        idx_seq = jnp.minimum(k.astype(jnp.int32)[None, :], n_win[:, None] - 1)
        use_idx = jnp.where(use_all, idx_seq, idx_lin)
        use_idx = jnp.clip(use_idx, 0, NWM - 1)
        sel = jnp.take_along_axis(wins, use_idx[:, None, :, None], axis=2)
        if upto == "windows":
            return chks(sel)
        tau = tsig.autocorr_tau(sel[:, :, 0, :], win // 2)
        if upto == "tau":
            return chks(sel, tau)
        P = cfg.max_takens_points
        tau_b = jnp.broadcast_to(tau[:, :, None], sel.shape[:3])
        pts, pmask = tsig.takens_embed(sel, tau_b, cfg.takens_dim,
                                       cfg.takens_subsample, P)
        ptsn = tsig.minmax_normalize_points(pts, pmask)
        if upto == "takens":
            return chks(ptsn)
        dm = tgeo.pairwise_distances(ptsn, pmask,
                                     pad_value=cfg.max_edge_length + 1.0)
        return chks(dm)

    phases = ["resample", "envelope", "bank", "windows", "tau", "takens",
              "dist"]
    res = {}
    NB = 4
    for ph in phases:
        f = jax.jit(lambda p=ph: pipeline(p))   # jit: match the fused program
        f().block_until_ready()
        ts = []
        for _ in range(4):
            t0 = time.time()
            for _ in range(NB):
                f().block_until_ready()
            ts.append((time.time() - t0) / NB)
        res[ph] = round(min(ts), 4)
        print(ph, res[ph], "s/batch", file=sys.stderr)
    marg, prev = {}, 0.0
    for ph in phases:
        marg[ph] = round(res[ph] - prev, 4)
        prev = res[ph]
    print(json.dumps(dict(prefix=res, marginal=marg)))


if __name__ == "__main__":
    main()
