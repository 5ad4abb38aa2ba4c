"""A/B on TPU: grouped-segmented Pallas kernel vs the XLA lockstep at the
EEG shape (n=47) — the round-4 big lever (EEG H1 is ~50 s of the ~100 s
study across the features + comparison stages).

Uses real study-shaped windows (synthetic device store → distance program).
Run:  python scratch/bench_grouped.py [n_windows=1024]
"""
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
    from tda_eeg_audio_tpu.models.programs import eeg_distance_program
    from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams
    from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas_grouped

    print("devices:", jax.devices(), file=sys.stderr)
    NW = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ds = build_synthetic_device(n_subjects=4, n_per_subject=4)
    dms = []
    need_rec = -(-NW // (5 * 40))
    for b0 in range(0, need_rec, 8):
        idxs = list(range(b0, min(b0 + 8, need_rec)))
        eeg, _, ns_e, _, _ = ds.batch(idxs, pad_to=8)
        dist, _, wmask = eeg_distance_program(eeg, ns_e, cfg, 90)
        d = dist[:, :, :40].reshape(-1, 47, 47)
        dms.append(d)
    dm = jnp.concatenate(dms)[:NW]
    print(f"{dm.shape[0]} study-shaped windows", file=sys.stderr)

    def timed(fn, reps=3):
        out = fn()
        jax.block_until_ready(out["births"])
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            jax.block_until_ready(out["births"])
            best = min(best, time.time() - t0)
        return best / dm.shape[0] * 1e3, out

    def vis(o):
        return np.asarray(jnp.sum(o["mask"])), np.asarray(jnp.sum(
            jnp.where(o["mask"], o["births"] + jnp.where(
                jnp.isfinite(o["deaths"]), o["deaths"], 0.0), 0.0)))

    def perwin(o):
        """Per-window (visible-bar count, order-invariant coord sum, ovf) —
        ON-DEVICE parity evidence: the CPU interpret-mode tests cannot catch
        a Mosaic miscompile, so the A/B itself must prove the candidate
        reproduces the lockstep's diagrams on hardware."""
        cnt = np.asarray(jnp.sum(o["mask"], axis=-1))
        s = np.asarray(jnp.sum(jnp.where(
            o["mask"], o["births"] + jnp.where(
                jnp.isfinite(o["deaths"]), o["deaths"], 0.0), 0.0), axis=-1))
        return cnt, s, np.asarray(o["overflow"])

    def mism(o, ref):
        """# windows whose diagrams differ from the reference's, excluding
        windows either side overflow-flagged (those reroute to exact redo
        in production)."""
        if ref is None:      # reference config failed: report unparityable
            return -1        # (write_tuning requires mism=0, so never promotes)
        c1, s1, v1 = perwin(o)
        c2, s2, v2 = perwin(ref)
        ok = ~(v1.astype(bool) | v2.astype(bool))
        bad = ok & ((c1 != c2)
                    | (np.abs(s1 - s2) > 1e-3 * np.maximum(np.abs(s2), 1.0)))
        return int(bad.sum())

    # production XLA lockstep at the study chunk sizes
    o_ref = None
    for chunk in (256, 128):
        def run_x(chunk=chunk):
            outs = [h1_diagrams(dm[c:c + chunk], n=47, thresh=2.0,
                                na_max=96, h1_max=96, step_budget=4096)
                    for c in range(0, dm.shape[0], chunk)]
            return {k: jnp.concatenate([o[k] for o in outs])
                    if outs[0][k].ndim else outs[0][k] for k in
                    ("births", "deaths", "mask", "overflow")}
        t, o = timed(run_x)
        if o_ref is None:
            o_ref = o
        print(f"xla lockstep  chunk={chunk:4d}          {t:7.4f} ms/win  "
              f"bars={vis(o)[0]} chk={vis(o)[1]:.3f} "
              f"ovf={np.asarray(jnp.sum(o['overflow']))}", flush=True)

    for group, na in ((4, 96), (8, 96), (8, 64), (12, 64), (16, 64)):
        vmem = group * (na + 6) * 36 * 128 * 4
        if vmem > 15.5e6:
            print(f"grouped g={group} na={na}: skipped (VMEM {vmem/1e6:.1f} MB)")
            continue
        def run_g(group=group, na=na):
            return h1_diagrams_pallas_grouped(
                dm, n=47, thresh=2.0, na_max=na, h1_max=96,
                step_budget=8192, group=group)
        try:
            t, o = timed(run_g)
            print(f"grouped       g={group:2d} na_max={na:3d}   {t:7.4f} "
                  f"ms/win  bars={vis(o)[0]} chk={vis(o)[1]:.3f} "
                  f"ovf={np.asarray(jnp.sum(o['overflow']))} "
                  f"mism={mism(o, o_ref)}", flush=True)
        except Exception as e:
            print(f"grouped g={group} na={na}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
