"""A/B the (g-word, vertex-lane) 2-D bit layout vs the flat-key layout in
the batched lockstep kernel, on the real TPU at study shapes (EEG n=47,
audio Takens n=124), with bar-for-bar parity."""
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
    from tda_eeg_audio_tpu.models.programs import audio_takens_program
    from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams
    from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas

    print("devices:", jax.devices(), file=sys.stderr)
    results = {}

    def run(f, tag, N, nc):
        t0 = time.time()
        outs = [f(c) for c in range(nc)]
        s = sum(float(np.asarray(o["births"]).sum()) for o in outs)
        warm = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            outs = [f(c) for c in range(nc)]
            s = sum(float(np.asarray(o["births"]).sum()) for o in outs)
            ts.append(time.time() - t0)
        ov = float(np.mean([np.asarray(o["overflow"]).mean() for o in outs]))
        results[tag] = dict(ms_per_window=round(1e3 * min(ts) / N, 3),
                            overflow=ov, warm_s=round(warm, 1),
                            chk=round(s, 1))
        print(tag, results[tag], file=sys.stderr)
        return outs

    # ---- EEG n=47 ----
    rng = np.random.default_rng(0)
    from scipy.ndimage import uniform_filter1d
    dml = []
    for _ in range(2048):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dm47 = jnp.asarray(np.stack(dml).astype(np.float32))
    C = 256
    kw = dict(n=47, thresh=cfg.max_edge_length, na_max=96, h1_max=96,
              step_budget=8192)
    f_flat = run(lambda c: h1_diagrams(dm47[c*C:(c+1)*C], layout="flat", **kw),
                 "eeg47_flat", 2048, 2048 // C)
    f_gv = run(lambda c: h1_diagrams(dm47[c*C:(c+1)*C], layout="gv", **kw),
               "eeg47_gv", 2048, 2048 // C)
    assert results["eeg47_flat"]["chk"] == results["eeg47_gv"]["chk"]

    # ---- audio n=124 ----
    ds = SynthDataset(n_subjects=2, n_per_subject=4)
    B = 8
    T_A = 44100 * 24
    audio = np.zeros((B, T_A), np.float32)
    ns = np.zeros(B, np.int32)
    for i in range(B):
        rec = ds.load(i)
        nn = min(len(rec["audio"]), T_A)
        audio[i, :nn] = rec["audio"][:nn]
        ns[i] = nn
    aud = audio_takens_program(jnp.asarray(audio), jnp.asarray(ns), cfg,
                               5900, 90, 15)
    P = cfg.max_takens_points
    dm = np.asarray(aud["dm"]).reshape(-1, P, P)
    npts = np.asarray(aud["n_pts"]).reshape(-1).astype(np.int32)
    km = np.asarray(aud["wmask"])
    valid = np.repeat(km[:, None, :], 5, 1).reshape(-1)
    dm, npts = dm[valid], npts[valid]
    for CA in (32, 64):
        NA = (len(dm) // CA) * CA
        dmj = jnp.asarray(dm[:NA]); npj = jnp.asarray(npts[:NA])
        kw2 = dict(n=P, thresh=cfg.max_edge_length, na_max=96, h1_max=96,
                   step_budget=8192)
        run(lambda c: h1_diagrams(dmj[c*CA:(c+1)*CA], npj[c*CA:(c+1)*CA],
                                  layout="gv", **kw2),
            f"aud124_gv_c{CA}", NA, NA // CA)
    CA = 240
    NA = (len(dm) // CA) * CA
    dmj = jnp.asarray(dm[:NA]); npj = jnp.asarray(npts[:NA])
    pal = run(lambda c: h1_diagrams_pallas(
        dmj[c*CA:(c+1)*CA], npj[c*CA:(c+1)*CA], n=P,
        thresh=cfg.max_edge_length, na_max=96, h1_max=96, step_budget=8192),
        "aud124_pallas", NA, NA // CA)
    # parity gv vs pallas on the first 64 windows
    gv = h1_diagrams(dmj[:64], npj[:64], n=P, thresh=cfg.max_edge_length,
                     na_max=96, h1_max=96, step_budget=8192, layout="gv")
    a = {k: np.asarray(v) for k, v in gv.items()}
    b = {k: np.asarray(v) for k, v in pal[0].items()}
    mism = 0
    for i in range(64):
        if a["overflow"][i] or b["overflow"][i]:
            continue
        ga = np.sort(np.stack([a["births"][i][a["mask"][i]],
                               a["deaths"][i][a["mask"][i]]], 1), 0)
        gb = np.sort(np.stack([b["births"][i][b["mask"][i]],
                               b["deaths"][i][b["mask"][i]]], 1), 0)
        if ga.shape != gb.shape or not np.allclose(ga, gb, atol=1e-5):
            mism += 1
    results["parity_gv_vs_pallas"] = mism
    print("parity gv vs pallas:", mism, file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
