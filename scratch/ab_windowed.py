"""A/B the windowed Pallas H1 kernel (dynamic [pivot,m_cx) row window) vs
the full-tile v1 kernel on the real TPU, audio n=124 and EEG n=47 shapes,
with bar-for-bar parity between the variants."""
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
    C = 240
    nchunk = len(dm) // C
    dm = jnp.asarray(dm[: nchunk * C])
    npts = jnp.asarray(npts[: nchunk * C])
    N = nchunk * C
    print(f"audio windows: {N}", file=sys.stderr)
    results = {}

    def run(f, tag, n_items, nc=None):
        nc = nchunk if nc is None else nc
        t0 = time.time()
        outs = [f(c) for c in range(nc)]
        jax.block_until_ready(outs)
        warm = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            outs = [f(c) for c in range(nc)]
            jax.block_until_ready(outs)
            ts.append(time.time() - t0)
        ov = float(np.mean([np.asarray(o["overflow"]).mean() for o in outs]))
        results[tag] = dict(ms_per_window=round(1e3 * min(ts) / n_items, 3),
                            overflow=ov, warm_s=round(warm, 1))
        print(tag, results[tag], file=sys.stderr)
        return outs

    def pal(windowed, fg=False):
        return lambda c: h1_diagrams_pallas(
            dm[c * C:(c + 1) * C], npts[c * C:(c + 1) * C], n=P,
            thresh=cfg.max_edge_length, na_max=96, h1_max=96,
            step_budget=8192, windowed=windowed, fast_gather=fg)

    w1 = run(pal(False), "pallas124_full", N)
    w2 = run(pal(False, fg=True), "pallas124_fastgather", N)
    mism = 0
    for o1, o2 in zip(w1, w2):
        a = {k: np.asarray(v) for k, v in o1.items()}
        b = {k: np.asarray(v) for k, v in o2.items()}
        for i in range(C):
            if a["overflow"][i] or b["overflow"][i]:
                continue
            ga = np.sort(np.stack([a["births"][i][a["mask"][i]],
                                   a["deaths"][i][a["mask"][i]]], 1), 0)
            gb = np.sort(np.stack([b["births"][i][b["mask"][i]],
                                   b["deaths"][i][b["mask"][i]]], 1), 0)
            if ga.shape != gb.shape or not np.allclose(ga, gb, atol=1e-5):
                mism += 1
    results["parity_mismatches_124"] = mism
    print("parity mismatches (124):", mism, file=sys.stderr)

    # EEG n=47: windowed pallas vs the production XLA lockstep
    rng = np.random.default_rng(0)
    from scipy.ndimage import uniform_filter1d
    dml = []
    for _ in range(960):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dm47 = jnp.asarray(np.stack(dml).astype(np.float32))
    npts47 = jnp.full((len(dml),), 47, jnp.int32)
    C47 = 240
    nchunk47 = len(dml) // C47

    def pal47(windowed):
        return lambda c: h1_diagrams_pallas(
            dm47[c * C47:(c + 1) * C47], npts47[c * C47:(c + 1) * C47],
            n=47, thresh=cfg.max_edge_length, na_max=96, h1_max=96,
            step_budget=8192, windowed=windowed)

    run(pal47(True), "pallas47_windowed", len(dml), nc=nchunk47)
    run(lambda c: h1_diagrams(
        dm47[c * C47:(c + 1) * C47], npts47[c * C47:(c + 1) * C47],
        n=47, thresh=cfg.max_edge_length, na_max=96, h1_max=96,
        step_budget=8192), "bitset47_lockstep", len(dml), nc=nchunk47)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
