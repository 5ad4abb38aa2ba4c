"""Attribute the fused comparison stage's wall clock across its
sub-programs at production shapes (B=16, K=15, pallas audio backend).
Times prefixes of the pipeline (async dispatch, one checksum readback)
and reports marginal cost per phase."""
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
    from tda_eeg_audio_tpu.models import programs as P

    print("devices:", jax.devices(), file=sys.stderr)
    Bp, K, NWM, NRS = 16, 15, 90, 5900
    T_E, T_A = 5900, 44100 * 24
    ds = SynthDataset(n_subjects=4, n_per_subject=4)
    eeg = np.zeros((Bp, 47, T_E), np.float32)
    audio = np.zeros((Bp, T_A), np.float32)
    ns_e = np.zeros(Bp, np.int32)
    ns_a = np.zeros(Bp, np.int32)
    from tda_eeg_audio_tpu.config import GOOD_ELECTRODES
    for i in range(Bp):
        rec = ds.load(i)
        e = rec["eeg_raw"][list(GOOD_ELECTRODES)]
        ne = min(e.shape[1], T_E)
        eeg[i, :, :ne] = e[:, :ne]
        ns_e[i] = ne
        na = min(len(rec["audio"]), T_A)
        audio[i, :na] = rec["audio"][:na]
        ns_a[i] = na
    eeg = jnp.asarray(eeg); audio = jnp.asarray(audio)
    ns_e = jnp.asarray(ns_e); ns_a = jnp.asarray(ns_a)
    H = 96
    WB = 5 * K
    mis = (jnp.zeros((Bp * WB, H), jnp.float32),
           jnp.zeros((Bp * WB, H), jnp.float32),
           jnp.zeros((Bp * WB, H), bool))
    mis_n_win = jnp.full((Bp,), 10, jnp.int32)
    mis_degen = jnp.zeros((Bp, 5, K), bool)

    def chks(*xs):
        return float(np.asarray(sum(jnp.sum(x.astype(jnp.float32)) for x in xs)))

    def pipeline(upto):
        n_win_e = P.window_count_program(ns_e, cfg.win_samples,
                                         cfg.step_samples, eeg.shape[-1])
        aud = P.audio_takens_program(audio, ns_a, cfg, NRS, NWM, K,
                                     n_win_cap=n_win_e)
        if upto == "takens":
            return chks(aud["dm"], aud["tau"])
        sel_e, kmask, n_pair = P._pair_distance_program(
            eeg, ns_e, aud["use_idx"], aud["n_win"], cfg, K, NWM)
        if upto == "pairsel":
            return chks(sel_e)
        e_out = P._diagrams_chunked_host(
            sel_e, jnp.full(sel_e.shape[:2], 47, jnp.int32),
            cfg.max_edge_length, 256, 96, 4096)
        if upto == "eegdg":
            return chks(e_out["births"], e_out["features"])
        Pp = cfg.max_takens_points
        a_out = P._diagrams_chunked_host(
            aud["dm"].reshape(Bp, 5 * K, Pp, Pp),
            aud["n_pts"].reshape(Bp, 5 * K),
            cfg.max_edge_length, 240, 96, 8192)
        if upto == "auddg":
            return chks(a_out["births"], a_out["features"],
                        e_out["births"], e_out["features"])
        _, e0d, e0m = P._h0_pack(e_out)
        _, a0d, a0m = P._h0_pack(a_out)
        w_h0 = P._wass_h0_exact_chunked(e0d, e0m, a0d, a0m)
        if upto == "h0":
            return chks(w_h0, a_out["features"], e_out["features"])
        e1 = P._h1_pack(e_out)
        a1 = P._h1_pack(a_out)
        if upto == "splitw":     # diagnostic only: the pre-fusion two-call
            w_h1 = P._wass_sinkhorn_tiered(*e1, *a1)
            w_mis = P._wass_sinkhorn_tiered(*e1, *mis)
            return chks(w_h0, w_h1, w_mis, a_out["features"],
                        e_out["features"])
        # production shape: ONE tiered call on concatenated matched +
        # mismatched pairs (programs._comparison_tail)
        n_pairs = e1[0].shape[0]
        w_both = P._wass_sinkhorn_tiered(
            *(jnp.concatenate([x, x]) for x in e1),
            jnp.concatenate([a1[0], mis[0]]),
            jnp.concatenate([a1[1], mis[1]]),
            jnp.concatenate([a1[2], mis[2]]))
        w_h1, w_mis = w_both[:n_pairs], w_both[n_pairs:]
        if upto == "bothw":
            return chks(w_h0, w_h1, w_mis, a_out["features"],
                        e_out["features"])
        out = P._comparison_stats_program(
            w_h0, w_h1, w_mis, e_out["features"], a_out["features"],
            kmask, aud["n_pts"] < 3, mis_degen, n_win_e, mis_n_win, K)
        return chks(out["w_h0"], out["w_h1"], out["corr_r"])

    phases = ["takens", "pairsel", "eegdg", "auddg", "h0", "bothw",
              "stats"]
    res = {}
    NB = 4   # batches per measurement (amortize dispatch)
    for ph in phases:
        pipeline(ph)            # warm/compile
        ts = []
        for _ in range(4):
            t0 = time.time()
            for _ in range(NB):
                pipeline(ph)
            ts.append((time.time() - t0) / NB)
        res[ph] = round(min(ts), 4)
        print(ph, res[ph], "s/batch", file=sys.stderr)
    marg = {}
    prev = 0.0
    for ph in phases:
        marg[ph] = round(res[ph] - prev, 4)
        prev = res[ph]
    # diagnostics off the marginal chain: the pre-fusion two-call Sinkhorn
    # (fusion saving = splitw - bothw) — same prefix through h0
    pipeline("splitw")
    ts = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(NB):
            pipeline("splitw")
        ts.append((time.time() - t0) / NB)
    res["splitw_diag"] = round(min(ts), 4)
    marg["sinkhorn_fusion_saving"] = round(res["splitw_diag"] - res["bothw"],
                                           4)
    # expected bank saving: the EEG corr→dist→H1 prefix the bank path skips
    marg["bank_skippable"] = round(marg["pairsel"] + marg["eegdg"], 4)
    print(json.dumps(dict(prefix=res, marginal=marg,
                          per_pair_ms={k: round(1e3 * v / (Bp * 5 * K), 4)
                                       for k, v in marg.items()})))


if __name__ == "__main__":
    main()
