"""(a) Bar-count distributions on realistic study windows (EEG + audio H1,
H0) — how small can the Sinkhorn cost matrices be?  (b) sinkhorn_cost
accuracy vs (steps, iters) against the exact JV engine."""
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
    from tda_eeg_audio_tpu.io.device_store import build_synthetic_device
    from tda_eeg_audio_tpu.models import programs
    from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas

    store = build_synthetic_device(n_subjects=4, n_per_subject=4)
    idxs = list(range(len(store)))[:32]
    eeg, audio, ns_e, ns_a, metas = store.batch(idxs)
    dist, _, wm = programs.eeg_distance_program(eeg, jnp.asarray(ns_e), cfg, 90)
    n_win_e = np.asarray(wm.sum(-1))
    aud = programs.audio_takens_program(audio, jnp.asarray(ns_a), cfg,
                                        5900, 90, 15,
                                        n_win_cap=jnp.asarray(n_win_e))
    P = cfg.max_takens_points
    adm = np.asarray(aud["dm"]).reshape(-1, P, P)
    anp = np.asarray(aud["n_pts"]).reshape(-1).astype(np.int32)
    km = np.repeat(np.asarray(aud["wmask"])[:, None, :], 5, 1).reshape(-1)
    adm, anp = adm[km], anp[km]

    out = h1_diagrams_pallas(jnp.asarray(adm[:512]), jnp.asarray(anp[:512]),
                             n=P, thresh=cfg.max_edge_length, na_max=80,
                             h1_max=96)
    a_bars = np.asarray(out["mask"]).sum(-1)
    a_h0 = np.asarray(out["h0_mask"]).sum(-1)

    use = np.asarray(aud["use_idx"])
    sel = np.asarray(dist)  # (B, 5, W, 47, 47)
    edm = sel[:, :, :15].reshape(-1, 47, 47)[:512]
    f, eout = programs.window_tda_features(jnp.asarray(edm), thresh=2.0,
                                           na_max=128, h1_max=128)
    e_bars = np.asarray(eout["mask"]).sum(-1)
    e_h0 = np.asarray(eout["h0_mask"]).sum(-1)
    res = dict(
        audio_h1=dict(mean=float(a_bars.mean()), p99=int(np.percentile(a_bars, 99)),
                      max=int(a_bars.max())),
        audio_h0=dict(mean=float(a_h0.mean()), max=int(a_h0.max())),
        eeg_h1=dict(mean=float(e_bars.mean()), p99=int(np.percentile(e_bars, 99)),
                    max=int(e_bars.max())),
        eeg_h0=dict(max=int(e_h0.max())),
    )
    print(json.dumps(res), file=sys.stderr)

    # ---- sinkhorn accuracy vs iteration budget, on REAL diagram pairs ----
    from tda_eeg_audio_tpu.ops.wasserstein import build_cost_matrix
    from tda_eeg_audio_tpu.ops import wasserstein as W
    from tda_eeg_audio_tpu.native.engine import wasserstein_batch
    from functools import partial

    K = 128
    N = 256
    def pack(births, deaths, mask, K):
        b = np.zeros((N, K), np.float32); d = np.zeros((N, K), np.float32)
        m = np.zeros((N, K), bool)
        bb = births[:N, :K]; dd = deaths[:N, :K]; mm = mask[:N, :K]
        fin = mm & np.isfinite(dd)
        b[:, :bb.shape[1]] = np.where(fin, bb, 0)
        d[:, :bb.shape[1]] = np.where(fin, dd, 0)
        m[:, :bb.shape[1]] = fin
        return b, d, m
    e_b, e_d, e_m = pack(np.asarray(eout["births"]), np.asarray(eout["deaths"]),
                         np.asarray(eout["mask"]), K)
    a_b, a_d, a_m = pack(np.asarray(out["births"]), np.asarray(out["deaths"]),
                         np.asarray(out["mask"]), K)
    np.savez("/tmp/sk_pairs.npz", e_b=e_b, e_d=e_d, e_m=e_m,
             a_b=a_b, a_d=a_d, a_m=a_m)
    exact = wasserstein_batch(e_b, e_d, e_m, a_b, a_d, a_m)

    D = build_cost_matrix(jnp.asarray(e_b), jnp.asarray(e_d), jnp.asarray(e_m),
                          jnp.asarray(a_b), jnp.asarray(a_d), jnp.asarray(a_m))
    for steps, iters in ((6, 80), (6, 40), (6, 20), (4, 40), (4, 20), (5, 30)):
        w = np.asarray(W.sinkhorn_cost(D, steps=steps, iters=iters))
        rel = np.abs(w - exact) / np.maximum(np.abs(exact), 1e-6)
        t0 = time.time()
        for _ in range(2):
            jax.block_until_ready(W.sinkhorn_cost(D, steps=steps, iters=iters))
        dt = (time.time() - t0) / 2
        print(json.dumps(dict(steps=steps, iters=iters,
                              max_rel=float(rel.max()),
                              mean_rel=float(rel.mean()),
                              us_per_pair=round(1e6 * dt / N, 1))),
              file=sys.stderr)


if __name__ == "__main__":
    main()
