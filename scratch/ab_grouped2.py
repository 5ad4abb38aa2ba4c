"""Dispatch-free A/B: bitset lockstep vs grouped-segmented Pallas kernel,
each inside ONE jitted program (lax.map over chunks) on identical
study-shaped EEG windows.  ab_grouped.py's numbers were confounded by
per-dispatch tunnel overhead (24 vs 6 host dispatches); this harness pays
exactly one dispatch per backend per run, like the production fused
feature program does.

Usage: python scratch/ab_grouped2.py [n_windows] [--groups 4,8]
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
    ap.add_argument("windows", type=int, nargs="?", default=1536)
    ap.add_argument("--groups", default="4,8")
    ap.add_argument("--lockstep-chunk", type=int, default=64)
    ap.add_argument("--grouped-chunk", type=int, default=256)
    ap.add_argument("--na-max", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from functools import partial
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.device_store import build_synthetic_device
    from tda_eeg_audio_tpu.models.programs import eeg_distance_program
    from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams
    import hp_r4_kernels as hp

    print("devices:", jax.devices(), file=sys.stderr)
    ds = build_synthetic_device(n_subjects=6, n_per_subject=4)
    n_rec = 24
    eeg, audio, ns_e, ns_a, metas = ds.batch(list(range(n_rec)))
    dist, _, wmask = eeg_distance_program(jnp.asarray(eeg),
                                          jnp.asarray(ns_e), cfg, 90)
    nw = np.asarray(wmask.sum(-1))
    dm_np = np.concatenate([np.asarray(dist[i, :, : nw[i]]).reshape(-1, 47, 47)
                            for i in range(n_rec)])
    N = min(args.windows, len(dm_np))
    print(f"EEG windows: {N}", file=sys.stderr)

    KEYS = ("births", "deaths", "mask", "overflow")

    def make_one_dispatch(fn, chunk, **kw):
        nck = N // chunk
        Nt = nck * chunk

        @jax.jit
        def prog(dm):                       # (Nt, 47, 47)
            def do(c):                      # (chunk, 47, 47)
                o = fn(c, n=47, thresh=cfg.max_edge_length,
                       na_max=args.na_max, h1_max=64, **kw)
                return {k: o[k] for k in KEYS}
            return jax.lax.map(do, dm.reshape(nck, chunk, 47, 47))

        dm_dev = jnp.asarray(dm_np[:Nt])

        def run():
            out = prog(dm_dev)
            jax.block_until_ready(out)
            return {k: np.asarray(out[k]).reshape(Nt, *out[k].shape[2:])
                    for k in KEYS}
        return run, Nt

    def bench(run, Nt, label):
        t0 = time.time(); out = run(); warm = time.time() - t0
        ts = []
        for _ in range(args.repeats):
            t0 = time.time(); run(); ts.append(time.time() - t0)
        r = dict(ms_per_window=round(1e3 * min(ts) / Nt, 4),
                 overflow=float(out["overflow"].mean()),
                 warm_s=round(warm, 1))
        print(label, r, file=sys.stderr)
        return out, r

    results = {}
    run_l, Nt_l = make_one_dispatch(h1_diagrams, args.lockstep_chunk,
                                    step_budget=4096)
    out_ref, results["lockstep_1disp"] = bench(run_l, Nt_l, "lockstep_1disp")

    # the production PER-WINDOW Pallas kernel at n=47 (crossover sweep's
    # n=48 row was degenerate, so the small-n side was never measured)
    from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas
    for pl_chunk in (args.grouped_chunk,):
        label = f"pallas_perwin_1disp_c{pl_chunk}"
        try:
            run_p, Nt_p = make_one_dispatch(h1_diagrams_pallas, pl_chunk,
                                            step_budget=8192)
            out_p, r = bench(run_p, Nt_p, label)
            Nc = min(Nt_l, Nt_p)
            okm = ~(out_ref["overflow"][:Nc] | out_p["overflow"][:Nc])
            same = True
            for k in ("births", "deaths", "mask"):
                a, b = out_ref[k][:Nc][okm], out_p[k][:Nc][okm]
                W = min(a.shape[1], b.shape[1])
                if out_ref["mask"][:Nc][okm][:, W:].any() or \
                   out_p["mask"][:Nc][okm][:, W:].any():
                    same = False
                a, b = a[:, :W], b[:, :W]
                if k == "deaths":
                    fin = np.isfinite(a) & np.isfinite(b)
                    same &= bool(np.allclose(a[fin], b[fin], atol=1e-6))
                    same &= bool((np.isfinite(a) == np.isfinite(b)).all())
                else:
                    same &= bool(np.allclose(np.asarray(a, np.float32),
                                             np.asarray(b, np.float32),
                                             atol=1e-6))
            r["parity_vs_lockstep"] = same
            r["parity_windows"] = int(okm.sum())
            results[label] = r
            print(label, "parity:", same, file=sys.stderr)
        except Exception as e:
            print(label, "FAILED:", str(e)[-400:], file=sys.stderr)
            results[label] = {"error": str(e)[-400:]}

    for g in [int(x) for x in args.groups.split(",")]:
        label = f"grouped_g{g}_1disp"
        try:
            run_g, Nt_g = make_one_dispatch(
                hp.h1_diagrams_pallas_grouped, args.grouped_chunk,
                step_budget=8192, group=g)
            out_g, r = bench(run_g, Nt_g, label)
        except Exception as e:
            print(label, "FAILED:", str(e)[-400:], file=sys.stderr)
            results[label] = {"error": str(e)[-400:]}
            continue
        Nc = min(Nt_l, Nt_g)
        okm = ~(out_ref["overflow"][:Nc] | out_g["overflow"][:Nc])
        same = True
        for k in ("births", "deaths", "mask"):
            a, b = out_ref[k][:Nc][okm], out_g[k][:Nc][okm]
            # backends may pad the bar axis to different widths; bars
            # beyond the common width must be dead on both sides
            W = min(a.shape[1], b.shape[1])
            if out_ref["mask"][:Nc][okm][:, W:].any() or \
               out_g["mask"][:Nc][okm][:, W:].any():
                same = False
            a, b = a[:, :W], b[:, :W]
            if k == "deaths":
                fin = np.isfinite(a) & np.isfinite(b)
                same &= bool(np.allclose(a[fin], b[fin], atol=1e-6))
                same &= bool((np.isfinite(a) == np.isfinite(b)).all())
            else:
                same &= bool(np.allclose(np.asarray(a, np.float32),
                                         np.asarray(b, np.float32),
                                         atol=1e-6))
        r["parity_vs_lockstep"] = same
        r["parity_windows"] = int(okm.sum())
        results[label] = r
        print(label, "parity:", same, file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
