"""A/B the pair-interleaved audio H1 kernel (hp_pair_kernel) against the
production per-window kernel on real audio-takens dm (n=124), same
process, equal dispatch counts.

Usage: python scratch/ab_pair.py [n_windows] [--repeats 5]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("windows", type=int, nargs="?", default=512)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--na-max", type=int, default=80)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.programs import audio_takens_program
    from tda_eeg_audio_tpu.ops.homology_pallas import (
        h1_diagrams_pallas as prod_pallas)
    from hp_pair_kernel import h1_diagrams_pallas_pair

    print("devices:", jax.devices(), file=sys.stderr)
    n_rec = max(8, args.windows // 64)
    ds = SynthDataset(n_subjects=max(2, n_rec // 4), n_per_subject=4)
    T_A = 44100 * 24
    audio = np.zeros((n_rec, T_A), np.float32)
    ns = np.zeros(n_rec, np.int32)
    for i in range(n_rec):
        rec = ds.load(i % len(ds))
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
    Cch = args.chunk
    nchunk = max(1, min(len(dm), args.windows) // Cch)
    dm = jnp.asarray(dm[: nchunk * Cch])
    npts = jnp.asarray(npts[: nchunk * Cch])
    N = nchunk * Cch
    print(f"audio windows: {N}, n_pts mean {np.asarray(npts).mean():.0f}",
          file=sys.stderr)

    def run(fn):
        outs = []
        for c in range(nchunk):
            o = fn(dm[c * Cch:(c + 1) * Cch], npts[c * Cch:(c + 1) * Cch],
                   n=P, thresh=cfg.max_edge_length, na_max=args.na_max,
                   h1_max=96, step_budget=8192)
            outs.append(o)
        jax.block_until_ready(outs)
        return {k: np.concatenate([np.asarray(o[k]) for o in outs])
                for k in ("births", "deaths", "mask", "overflow")}

    # warm both first, then INTERLEAVE repeats (tunnel throughput drifts
    # ~40% between windows; interleaving makes the comparison paired)
    t0 = time.time(); out_ref = run(prod_pallas); w1 = time.time() - t0
    t0 = time.time(); out_p = run(h1_diagrams_pallas_pair); w2 = time.time() - t0
    ts_prod, ts_pair = [], []
    for _ in range(args.repeats):
        t0 = time.time(); run(prod_pallas); ts_prod.append(time.time() - t0)
        t0 = time.time(); run(h1_diagrams_pallas_pair)
        ts_pair.append(time.time() - t0)

    okm = ~(out_ref["overflow"] | out_p["overflow"])
    same = True
    for k in ("births", "deaths", "mask"):
        a, b = out_ref[k][okm], out_p[k][okm]
        W = min(a.shape[1], b.shape[1])
        a, b = a[:, :W], b[:, :W]
        if k == "deaths":
            fin = np.isfinite(a) & np.isfinite(b)
            same &= bool(np.allclose(a[fin], b[fin], atol=1e-6))
            same &= bool((np.isfinite(a) == np.isfinite(b)).all())
        else:
            same &= bool(np.allclose(np.asarray(a, np.float32),
                                     np.asarray(b, np.float32), atol=1e-6))
    res = dict(
        prod=dict(ms_per_window=round(1e3 * min(ts_prod) / N, 4),
                  all=[round(1e3 * t / N, 4) for t in ts_prod],
                  warm_s=round(w1, 1),
                  overflow=float(out_ref["overflow"].mean())),
        pair=dict(ms_per_window=round(1e3 * min(ts_pair) / N, 4),
                  all=[round(1e3 * t / N, 4) for t in ts_pair],
                  warm_s=round(w2, 1),
                  overflow=float(out_p["overflow"].mean()),
                  parity_vs_prod=same, parity_windows=int(okm.sum())))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
