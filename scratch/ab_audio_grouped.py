"""A/B at the AUDIO shape (n=124, real audio-takens dm): production
per-window Pallas kernel vs the fixed grouped-segmented kernel, across
na_max {64, 80}.  The multi-chain kernel (chains within one window) lost
its A/B (scratch/ab_chains.py: 1.46/2.24 ms/win vs prod 0.83); grouped
(multiple windows per program instance) won 3.5x at the EEG shape, so
test it here too -- auddg is ~30 s of the 75 s study.

Usage: python scratch/ab_audio_grouped.py [n_windows] [--groups 2,4]
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
    ap.add_argument("--groups", default="2,4")
    ap.add_argument("--na-max", default="64,80")
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=3)
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
    import hp_r4_kernels as hp

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

    def run(fn, na_max, **kw):
        outs = []
        for c in range(nchunk):
            o = fn(dm[c * Cch:(c + 1) * Cch], npts[c * Cch:(c + 1) * Cch],
                   n=P, thresh=cfg.max_edge_length, na_max=na_max,
                   h1_max=96, **kw)
            outs.append(o)
        jax.block_until_ready(outs)
        return {k: np.concatenate([np.asarray(o[k]) for o in outs])
                for k in ("births", "deaths", "mask", "overflow")}

    def bench(fn, label, na_max, **kw):
        t0 = time.time()
        out = run(fn, na_max, **kw)
        warm = time.time() - t0
        ts = []
        for _ in range(args.repeats):
            t0 = time.time(); run(fn, na_max, **kw); ts.append(time.time() - t0)
        r = dict(ms_per_window=round(1e3 * min(ts) / N, 4),
                 overflow=float(out["overflow"].mean()),
                 warm_s=round(warm, 1))
        print(label, r, file=sys.stderr)
        return out, r

    results = {}
    out_ref = None
    for na in [int(x) for x in args.na_max.split(",")]:
        try:
            out_p, r = bench(prod_pallas, f"prod_na{na}", na,
                             step_budget=8192)
            if na == 80:
                out_ref = out_p
            results[f"prod_na{na}"] = r
        except Exception as e:
            print(f"prod_na{na} FAILED:", str(e)[-300:], file=sys.stderr)
            results[f"prod_na{na}"] = {"error": str(e)[-300:]}
        for g in [int(x) for x in args.groups.split(",")]:
            label = f"grouped_g{g}_na{na}"
            try:
                out_g, r = bench(hp.h1_diagrams_pallas_grouped, label, na,
                                 step_budget=8192, group=g)
            except Exception as e:
                print(label, "FAILED:", str(e)[-400:], file=sys.stderr)
                results[label] = {"error": str(e)[-400:]}
                continue
            if out_ref is not None:
                okm = ~(out_ref["overflow"] | out_g["overflow"])
                same = True
                for k in ("births", "deaths", "mask"):
                    a, b = out_ref[k][okm], out_g[k][okm]
                    if k == "deaths":
                        fin = np.isfinite(a) & np.isfinite(b)
                        same &= bool(np.allclose(a[fin], b[fin], atol=1e-6))
                        same &= bool((np.isfinite(a) == np.isfinite(b)).all())
                    else:
                        same &= bool(np.allclose(np.asarray(a, np.float32),
                                                 np.asarray(b, np.float32),
                                                 atol=1e-6))
                r["parity_vs_prod80"] = same
                r["parity_windows"] = int(okm.sum())
            results[label] = r
    print(json.dumps(results))


if __name__ == "__main__":
    main()
