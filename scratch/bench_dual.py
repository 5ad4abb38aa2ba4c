"""A/B on TPU: multi-chain audio H1 kernel (chains=2/4) vs the production
single-chain per-window kernel at n=124 — targets the ~32 s audio-H1 share
of the comparison stage.

Run:  python scratch/bench_dual.py [n_windows=512]
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
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.programs import audio_takens_program
    from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas

    print("devices:", jax.devices(), file=sys.stderr)
    NW = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ds = SynthDataset(n_subjects=4, n_per_subject=2)
    dms, npts = [], []
    P = cfg.max_takens_points
    for b0 in range(0, -(-NW // 75), 4):
        audio = np.zeros((4, 44100 * 24), np.float32)
        ns = np.zeros(4, np.int32)
        for k, i in enumerate(range(b0, b0 + 4)):
            rec = ds.load(i % len(ds))
            na = min(len(rec["audio"]), 44100 * 24)
            audio[k, :na] = rec["audio"][:na]
            ns[k] = na
        aud = audio_takens_program(jnp.asarray(audio), jnp.asarray(ns), cfg,
                                   5900, 90, 15)
        dms.append(np.asarray(aud["dm"]).reshape(-1, P, P))
        npts.append(np.asarray(aud["n_pts"]).reshape(-1))
    dm = np.concatenate(dms)[:NW]
    npt = np.concatenate(npts)[:NW].astype(np.int32)
    keep = npt >= 3
    dm, npt = jnp.asarray(dm[keep]), jnp.asarray(npt[keep])
    print(f"{dm.shape[0]} real audio Takens windows", file=sys.stderr)

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

    def perwin(o):
        """Per-window (bar count, order-invariant coord sum, ovf) — the
        ON-DEVICE parity evidence the promotion gate requires (interpret-
        mode tests cannot catch a Mosaic miscompile)."""
        cnt = np.asarray(jnp.sum(o["mask"], axis=-1))
        s = np.asarray(jnp.sum(jnp.where(
            o["mask"], o["births"] + jnp.where(
                jnp.isfinite(o["deaths"]), o["deaths"], 0.0), 0.0), axis=-1))
        return cnt, s, np.asarray(o["overflow"])

    def mism(o, ref):
        if ref is None:      # reference config failed: report unparityable
            return -1        # (write_tuning requires mism=0, so never promotes)
        c1, s1, v1 = perwin(o)
        c2, s2, v2 = perwin(ref)
        ok = ~(v1.astype(bool) | v2.astype(bool))
        bad = ok & ((c1 != c2)
                    | (np.abs(s1 - s2) > 1e-3 * np.maximum(np.abs(s2), 1.0)))
        return int(bad.sum())

    o_ref = None
    # chains=8 is VMEM-marginal at n=124 (stored arena 11.8 MB + 8 col
    # tiles ~1 MB + packed block); the try/except below turns a compile
    # failure into a skipped candidate instead of a dead battery step
    for chains in (1, 2, 4, 8):
        def run(chains=chains):
            return h1_diagrams_pallas(dm, npt, n=P, thresh=2.0, na_max=96,
                                      h1_max=96, step_budget=8192,
                                      chains=chains)
        try:
            t, o = timed(run)
            if o_ref is None:
                o_ref = o
            print(f"chains={chains}  {t:7.4f} ms/win  steps="
                  f"{int(np.asarray(o['steps']))} "
                  f"ovf={int(np.asarray(jnp.sum(o['overflow'])))} "
                  f"bars={int(np.asarray(jnp.sum(o['mask'])))} "
                  f"mism={mism(o, o_ref)}", flush=True)
        except Exception as e:
            print(f"chains={chains}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
