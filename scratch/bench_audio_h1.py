"""Measure audio-branch H1 backends on realistic Takens matrices (n=124).

Generates audio through the real audio_takens_program, then times
h1_diagrams (bitset) vs h1_diagrams_sparse (sorted-list) across chunk sizes
and col_width values; reports ms/window, overflow rates, and parity on
non-overflow windows.
"""
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
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--widths", default="512,1024,2048")
    ap.add_argument("--skip-bitset", action="store_true")
    args = ap.parse_args()

    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.programs import audio_takens_program
    from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams, h1_diagrams_sparse

    ds = SynthDataset(n_subjects=max(2, args.recordings // 4), n_per_subject=4)
    B = args.recordings
    T_A = 44100 * 24
    audio = np.zeros((B, T_A), np.float32)
    ns = np.zeros(B, np.int32)
    for i in range(B):
        rec = ds.load(i)
        n = min(len(rec["audio"]), T_A)
        audio[i, :n] = rec["audio"][:n]
        ns[i] = n
    aud = audio_takens_program(jnp.asarray(audio), jnp.asarray(ns), cfg,
                               5900, 90, 15)
    P = cfg.max_takens_points
    dm = np.asarray(aud["dm"]).reshape(-1, P, P)
    npts = np.asarray(aud["n_pts"]).reshape(-1).astype(np.int32)
    km = np.asarray(aud["wmask"])  # (B,K) -> valid windows
    valid = np.repeat(km[:, None, :], 5, 1).reshape(-1)
    dm, npts = dm[valid], npts[valid]
    N = len(dm)
    print(f"windows: {N}, n_pts mean {npts.mean():.0f} min {npts.min()} "
          f"max {npts.max()}", file=sys.stderr)

    C = args.chunk
    nchunk = N // C
    dm_d = jnp.asarray(dm[: nchunk * C])
    np_d = jnp.asarray(npts[: nchunk * C])

    def run(fn, **kw):
        outs = []
        for c in range(nchunk):
            o = fn(dm_d[c * C:(c + 1) * C], np_d[c * C:(c + 1) * C],
                   n=P, thresh=cfg.max_edge_length, na_max=96, h1_max=96, **kw)
            outs.append(o)
        jax.block_until_ready(outs)
        return {k: np.concatenate([np.asarray(o[k]) for o in outs])
                for k in ("births", "deaths", "mask", "overflow")}

    results = {}
    if not args.skip_bitset:
        t0 = time.time(); out_b = run(h1_diagrams, step_budget=8192)
        warm = time.time() - t0
        ts = []
        for _ in range(args.repeats):
            t0 = time.time(); run(h1_diagrams, step_budget=8192)
            ts.append(time.time() - t0)
        results["bitset"] = dict(ms_per_window=1e3 * min(ts) / (nchunk * C),
                                 overflow=float(out_b["overflow"].mean()),
                                 warm_s=round(warm, 1))
        print("bitset", results["bitset"], file=sys.stderr)

    for w in [int(x) for x in args.widths.split(",")]:
        t0 = time.time()
        out_s = run(h1_diagrams_sparse, step_budget=8192, col_width=w)
        warm = time.time() - t0
        ts = []
        for _ in range(args.repeats):
            t0 = time.time(); run(h1_diagrams_sparse, step_budget=8192,
                                  col_width=w)
            ts.append(time.time() - t0)
        r = dict(ms_per_window=1e3 * min(ts) / (nchunk * C),
                 overflow=float(out_s["overflow"].mean()), warm_s=round(warm, 1))
        if not args.skip_bitset:
            okmask = ~(out_b["overflow"] | out_s["overflow"])
            same = True
            for k in ("births", "deaths", "mask"):
                a, b = out_b[k][okmask], out_s[k][okmask]
                if k == "deaths":
                    fin = np.isfinite(a) & np.isfinite(b)
                    same &= bool(np.allclose(a[fin], b[fin], atol=1e-6)) and \
                        bool((np.isfinite(a) == np.isfinite(b)).all())
                else:
                    same &= bool(np.allclose(np.asarray(a, np.float32),
                                             np.asarray(b, np.float32),
                                             atol=1e-6))
            r["parity_vs_bitset"] = same
        results[f"sparse_{w}"] = r
        print(f"sparse w={w}", r, file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
