"""Measure the audio-H1 Pallas kernel's sensitivity to g_cap (the static
edge-space cap), on real study-shaped Takens windows.

Question: is the per-step cost dominated by the (g_cap/32, 128) vector ops
(→ bucketing windows by m_cx into two pallas variants would win ~2x on the
small bucket) or by fixed while_loop overhead (→ bucketing is a wash)?

Run on the TPU:  python scratch/bench_gcap.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from tda_eeg_audio_tpu.runtime import enable_compilation_cache

enable_compilation_cache()

from tda_eeg_audio_tpu.config import DEFAULT_CONFIG
from tda_eeg_audio_tpu.io.device_store import build_synthetic_device
from tda_eeg_audio_tpu.models.programs import audio_takens_program
from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas
from tda_eeg_audio_tpu.ops.homology_h1 import _phase1

cfg = DEFAULT_CONFIG
P = cfg.max_takens_points
ds = build_synthetic_device(n_subjects=4, n_per_subject=4)
eeg, audio, ns_e, ns_a, metas = ds.batch(list(range(16)))
aud = audio_takens_program(jnp.asarray(audio), jnp.asarray(ns_a), cfg,
                           5900, 90, 15)
dm = np.asarray(aud["dm"]).reshape(-1, P, P)
n_pts = np.asarray(aud["n_pts"]).reshape(-1)
print(f"{dm.shape[0]} windows, P={P}")

ph = _phase1(jnp.asarray(dm), P, cfg.max_edge_length, 80,
             jnp.asarray(n_pts, jnp.int32))
m_cx = np.asarray(ph["m_cx"])
n_na = np.asarray(jnp.sum(ph["na_list"] >= 0, axis=-1))
print(f"m_cx: min {m_cx.min()} med {np.median(m_cx):.0f} "
      f"p90 {np.percentile(m_cx, 90):.0f} max {m_cx.max()} "
      f"(full edge space {P*(P-1)//2})")
print(f"n_na: med {np.median(n_na):.0f} max {n_na.max()}")

FULL = -(-(P * (P - 1) // 2) // 128) * 128


def run(dmw, nptsw, g_cap, tag, reps=3):
    d = jnp.asarray(dmw)
    npts = jnp.asarray(nptsw, jnp.int32)
    out = h1_diagrams_pallas(d, npts, n=P, thresh=cfg.max_edge_length,
                             na_max=80, h1_max=96, step_budget=8192,
                             g_cap=g_cap)
    jax.block_until_ready(out["births"])          # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = h1_diagrams_pallas(d, npts, n=P, thresh=cfg.max_edge_length,
                                 na_max=80, h1_max=96, step_budget=8192,
                                 g_cap=g_cap)
        jax.block_until_ready(out["births"])
        best = min(best, time.time() - t0)
    steps = int(out["steps"])
    ovf = int(np.sum(np.asarray(out["overflow"])))
    print(f"{tag}: g_cap {g_cap}  {best*1e3/len(dmw):.3f} ms/window  "
          f"({best:.3f} s/{len(dmw)}; {steps} steps, {ovf} ovf, "
          f"{best*1e6/max(steps,1):.2f} us/step)")
    return best


# bucket windows by m_cx
halfcap = FULL // 2 // 128 * 128
lo = m_cx <= halfcap
print(f"windows with m_cx <= {halfcap}: {lo.sum()}/{len(m_cx)}")
N = (len(dm) // 240) * 240
run(dm[:N], n_pts[:N], FULL, "all@full")
nlo = (lo.sum() // 16) * 16
if nlo >= 48:
    run(dm[lo][:nlo], n_pts[lo][:nlo], FULL, "lo@full ")
    run(dm[lo][:nlo], n_pts[lo][:nlo], halfcap, "lo@half ")
