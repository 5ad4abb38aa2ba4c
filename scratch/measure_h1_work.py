"""Per-window H1 workload statistics on realistic audio Takens matrices.

Answers two questions the kernel optimization depends on:
  1. per-window lockstep step count (run at B=1 so no divergence) — how much
     of the chunked kernel's time is divergence waste vs inherent work;
  2. m_cx (in-complex edge count after enclosing-radius truncation) and
     column-support distributions — how big a Pallas column buffer must be.

Runs on CPU (forced) — only step counts matter here, not timing.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from tda_eeg_audio_tpu.runtime import force_cpu
    force_cpu()
    import jax
    import jax.numpy as jnp
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.programs import audio_takens_program
    from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams

    ds = SynthDataset(n_subjects=2, n_per_subject=4)
    B = 8
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
    km = np.asarray(aud["wmask"])
    valid = np.repeat(km[:, None, :], 5, 1).reshape(-1)
    dm, npts = dm[valid], npts[valid]
    N = min(len(dm), 120)
    dm, npts = dm[:N], npts[:N]

    # --- m_cx from numpy (same math as _phase1) ---
    m_cx_list, r_enc_list = [], []
    for k in range(N):
        n_p = npts[k]
        d = dm[k][:n_p, :n_p]
        r_enc = float(np.min(np.max(d, axis=1)))
        eff = min(cfg.max_edge_length, r_enc)
        iu, ju = np.triu_indices(P, k=1)
        w = dm[k][iu, ju]
        m_cx_list.append(int(np.sum(w <= eff)))
        r_enc_list.append(r_enc)
    m_cx = np.array(m_cx_list)

    # --- per-window steps at B=1 (no divergence) ---
    f = jax.jit(lambda d, p: h1_diagrams(
        d, p, n=P, thresh=cfg.max_edge_length, na_max=96, h1_max=96,
        step_budget=8192))
    steps, n_na = [], []
    for k in range(N):
        out = f(jnp.asarray(dm[k:k + 1]), jnp.asarray(npts[k:k + 1]))
        steps.append(int(out["steps"]))
        n_na.append(int(out["n_na"][0]))
        if k % 20 == 0:
            print(f"  {k}/{N} steps={steps[-1]} n_na={n_na[-1]} "
                  f"m_cx={m_cx[k]}", file=sys.stderr)
    steps = np.array(steps); n_na = np.array(n_na)
    out = dict(
        n_windows=N,
        npts=dict(mean=float(npts[:N].mean()), min=int(npts[:N].min()),
                  max=int(npts[:N].max())),
        m_cx=dict(mean=float(m_cx.mean()), p50=int(np.percentile(m_cx, 50)),
                  p90=int(np.percentile(m_cx, 90)), max=int(m_cx.max())),
        steps=dict(mean=float(steps.mean()), p50=int(np.percentile(steps, 50)),
                   p90=int(np.percentile(steps, 90)), max=int(steps.max())),
        n_na=dict(mean=float(n_na.mean()), max=int(n_na.max())),
        xors_per_col=float((steps - 2 * n_na).sum() / max(n_na.sum(), 1)),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
