"""EEG H1 lockstep: per-window time vs chunk size (divergence waste).

The lockstep while_loop advances every window of a chunk one pivot per
step, so each chunk pays max(chain) over its windows; smaller chunks cut
that waste but add dispatch overhead.  Measures real study-shaped EEG
windows at n=47.

Run on the TPU:  python scratch/bench_eeg_chunk.py
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
from tda_eeg_audio_tpu.models.programs import eeg_distance_program
from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams, _phase1

cfg = DEFAULT_CONFIG
ds = build_synthetic_device(n_subjects=4, n_per_subject=4)
eeg, audio, ns_e, ns_a, metas = ds.batch(list(range(16)))
dist, _, wmask = eeg_distance_program(jnp.asarray(eeg), jnp.asarray(ns_e),
                                      cfg, 90)
nw = np.asarray(wmask.sum(-1))
dm = np.concatenate([np.asarray(dist[i, :, : nw[i]]).reshape(-1, 47, 47)
                     for i in range(16)])
print(f"{dm.shape[0]} EEG windows")
ph = _phase1(jnp.asarray(dm[:512]), 47, cfg.max_edge_length, 64, None)
m_cx = np.asarray(ph["m_cx"])
print(f"m_cx/1081: med {np.median(m_cx):.0f} p90 {np.percentile(m_cx,90):.0f} "
      f"max {m_cx.max()}")

N = 1536
dmj = jnp.asarray(dm[:N])


def run(chunk, reps=3):
    def prog(x):
        outs = []
        for c in range(0, N, chunk):
            outs.append(h1_diagrams(x[c:c + chunk], n=47,
                                    thresh=cfg.max_edge_length,
                                    na_max=64, h1_max=64, step_budget=4096))
        return outs

    outs = prog(dmj)
    jax.block_until_ready([o["births"] for o in outs])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        outs = prog(dmj)
        jax.block_until_ready([o["births"] for o in outs])
        best = min(best, time.time() - t0)
    steps = sum(int(o["steps"]) for o in outs)
    print(f"chunk {chunk:4d}: {best*1e3/N:.4f} ms/window "
          f"({best:.3f} s / {N}; lockstep steps {steps})")


for chunk in (256, 128, 64, 512):
    run(chunk)
