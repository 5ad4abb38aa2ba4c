"""A/B the fixed grouped-segmented EEG H1 kernel (hp_r4_kernels) against
the production XLA bitset lockstep at the EEG shape (n=47).

Same story as ab_chains.py: the kernel was deleted in round 5 as
"compiler-blocked"; the bisect found the i1-select Mosaic bug + scoped-vmem
shortfall, both now fixed in hp_r4_kernels.  Reports ms/window and
bar-for-bar parity on real study-shaped EEG windows.

Usage: python scratch/ab_grouped.py [n_windows] [--groups 4,8,12]
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
    ap.add_argument("--groups", default="4,8,12")
    ap.add_argument("--chunk", type=int, default=64,
                    help="production lockstep chunk (tuned default 64)")
    ap.add_argument("--na-max", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
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
    dm = np.concatenate([np.asarray(dist[i, :, : nw[i]]).reshape(-1, 47, 47)
                         for i in range(n_rec)])
    N = min(args.windows, len(dm))
    dm = jnp.asarray(dm[:N])
    print(f"EEG windows: {N}", file=sys.stderr)

    Cch = args.chunk

    def run_lockstep():
        outs = []
        for c in range(0, N, Cch):
            outs.append(h1_diagrams(dm[c:c + Cch], n=47,
                                    thresh=cfg.max_edge_length,
                                    na_max=args.na_max, h1_max=64,
                                    step_budget=4096))
        jax.block_until_ready([o["births"] for o in outs])
        return {k: np.concatenate([np.asarray(o[k]) for o in outs])
                for k in ("births", "deaths", "mask", "overflow")}

    def run_grouped(g):
        outs = []
        for c in range(0, N, 256):
            outs.append(hp.h1_diagrams_pallas_grouped(
                dm[c:c + 256], n=47, thresh=cfg.max_edge_length,
                na_max=args.na_max, h1_max=64, step_budget=8192, group=g))
        jax.block_until_ready([o["births"] for o in outs])
        return {k: np.concatenate([np.asarray(o[k]) for o in outs])
                for k in ("births", "deaths", "mask", "overflow")}

    def bench(fn, label):
        t0 = time.time()
        out = fn()
        warm = time.time() - t0
        ts = []
        for _ in range(args.repeats):
            t0 = time.time(); fn(); ts.append(time.time() - t0)
        r = dict(ms_per_window=round(1e3 * min(ts) / N, 4),
                 overflow=float(out["overflow"].mean()),
                 warm_s=round(warm, 1))
        print(label, r, file=sys.stderr)
        return out, r

    results = {}
    out_ref, results["lockstep"] = bench(run_lockstep,
                                         f"lockstep_c{Cch}")

    for g in [int(x) for x in args.groups.split(",")]:
        label = f"grouped_g{g}"
        try:
            out_g, r = bench(lambda g=g: run_grouped(g), label)
        except Exception as e:
            print(label, "FAILED:", str(e)[-400:], file=sys.stderr)
            results[label] = {"error": str(e)[-400:]}
            continue
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
        r["parity_vs_lockstep"] = same
        r["parity_windows"] = int(okm.sum())
        results[label] = r
        print(label, "parity:", same, file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
