"""Time h1_diagrams_pallas vs h1_diagrams on the real TPU (audio n=124 and
EEG n=47 shapes), with bar-for-bar parity on the same windows."""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recordings", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--na-max", type=int, default=80)
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--eeg", action="store_true", help="also bench n=47")
    args = ap.parse_args()

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
    ds = SynthDataset(n_subjects=max(2, args.recordings // 4), n_per_subject=4)
    B = args.recordings
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
    C = args.chunk
    nchunk = len(dm) // C
    dm = jnp.asarray(dm[: nchunk * C])
    npts = jnp.asarray(npts[: nchunk * C])
    N = nchunk * C
    print(f"audio windows: {N}, n_pts mean {np.asarray(npts).mean():.0f}",
          file=sys.stderr)
    results = {}

    def run(f, tag):
        t0 = time.time()
        outs = [f(dm[c * C:(c + 1) * C], npts[c * C:(c + 1) * C])
                for c in range(nchunk)]
        jax.block_until_ready(outs)
        warm = time.time() - t0
        ts = []
        for _ in range(2):
            t0 = time.time()
            outs = [f(dm[c * C:(c + 1) * C], npts[c * C:(c + 1) * C])
                    for c in range(nchunk)]
            jax.block_until_ready(outs)
            ts.append(time.time() - t0)
        ov = float(np.mean([np.asarray(o["overflow"]).mean() for o in outs]))
        results[tag] = dict(ms_per_window=round(1e3 * min(ts) / N, 3),
                            overflow=ov, warm_s=round(warm, 1))
        print(tag, results[tag], file=sys.stderr)
        return outs

    pal = run(lambda d, p: h1_diagrams_pallas(
        d, p, n=P, thresh=cfg.max_edge_length, na_max=args.na_max,
        h1_max=args.na_max, step_budget=8192), "pallas124")
    if not args.skip_xla:
        xla = run(lambda d, p: h1_diagrams(
            d, p, n=P, thresh=cfg.max_edge_length, na_max=96, h1_max=96,
            step_budget=8192), "bitset124")
        # parity on chunk 0
        a = {k: np.asarray(v) for k, v in xla[0].items()}
        b = {k: np.asarray(v) for k, v in pal[0].items()}
        mism = 0
        for i in range(C):
            if a["overflow"][i] or b["overflow"][i]:
                continue
            ga = np.sort(np.stack([a["births"][i][a["mask"][i]],
                                   a["deaths"][i][a["mask"][i]]], 1), 0)
            gb = np.sort(np.stack([b["births"][i][b["mask"][i]],
                                   b["deaths"][i][b["mask"][i]]], 1), 0)
            if ga.shape != gb.shape or not np.allclose(ga, gb, atol=1e-5):
                mism += 1
        results["parity_mismatches"] = mism
        print("parity mismatches:", mism, file=sys.stderr)

    if args.eeg:
        rng = np.random.default_rng(0)
        from scipy.ndimage import uniform_filter1d
        dml = []
        for _ in range(args.chunk * 4):
            X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
            r = np.corrcoef(X)
            d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
            np.fill_diagonal(d, 0)
            dml.append(d)
        dm = jnp.asarray(np.stack(dml).astype(np.float32))
        npts = jnp.full((len(dml),), 47, jnp.int32)
        nchunk = len(dml) // C
        N = nchunk * C
        run(lambda d, p: h1_diagrams_pallas(
            d, p, n=47, thresh=cfg.max_edge_length, na_max=96,
            h1_max=96, step_budget=8192), "pallas47")
        if not args.skip_xla:
            run(lambda d, p: h1_diagrams(
                d, p, n=47, thresh=cfg.max_edge_length, na_max=96, h1_max=96,
                step_budget=8192), "bitset47")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
# (windowed-kernel A/B appended by round 3: run with --ab-windowed)
