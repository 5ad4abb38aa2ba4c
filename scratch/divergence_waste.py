"""Quantify the EEG lockstep kernel's divergence waste EXACTLY, by simulation.

The XLA lockstep kernel (homology_h1.h1_diagrams) advances every window of a
chunk one reduction step per while_loop iteration; a chunk runs until its
slowest window finishes, so

    chunk cost  = C x max_w(steps_w)          (what the kernel pays)
    useful work = sum_w(steps_w)              (what a divergence-free kernel pays)

This script computes per-window sequential step counts (the same simulation
as scratch/sim_rounds.py, EEG-shaped) for windows in the features stage's
PRODUCTION order -- per recording, bands-major, K+K_CMP window columns, i.e.
the order the fused program's (M = N_BANDS*Kx) axis chunks -- and reports the
waste ratio max-based/sum-based at the production chunk (64) for:
  * production order
  * globally sorted by exact step count (oracle upper bound for any sorting)
  * sorted by n_na (the cheap predictor step 10's A/B used)

If oracle-sorted waste ~= production waste, the sorting lever is dead and the
step-10 A/B's noise doesn't matter.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def eeg_windows_production_order(n_rec=6, K=24):
    """Per-window (47,47) distance matrices in the fused program's order."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.study import StudyRunner

    ds = SynthDataset(n_subjects=max(2, n_rec // 4), n_per_subject=4)
    runner = StudyRunner(ds, cfg, verbose=False)
    dms = []
    for i in range(min(n_rec, len(ds))):
        dist, wmask, _ = runner.eeg_distances([i])   # (1, 5, W, 47, 47)
        d = np.asarray(dist[0])
        m = np.asarray(wmask[0]) if wmask is not None else None
        nw = d.shape[1]
        take = np.linspace(0, nw - 1, min(K, nw)).astype(int)
        for bd in range(d.shape[0]):
            for k in take:
                dms.append(d[bd, k])
    return dms


def seq_steps(d, thresh=2.0):
    """Exact lockstep step count for one window (mirrors sim_rounds)."""
    from sim_rounds import simulate
    return simulate(d, thresh)["seq_steps"]


def waste(steps, chunk):
    steps = np.asarray(steps, np.int64)
    tot_max = 0
    for c0 in range(0, len(steps), chunk):
        blk = steps[c0:c0 + chunk]
        tot_max += int(blk.max()) * len(blk)
    return tot_max / steps.sum()


def main():
    t0 = time.time()
    dms = eeg_windows_production_order()
    print(f"{len(dms)} windows ({time.time()-t0:.0f}s)", file=sys.stderr)
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    steps = np.array([seq_steps(d) for d in dms])
    from sim_rounds import simulate
    nna = np.array([simulate(d)["n_na"] for d in dms])
    out = dict(
        n_windows=len(dms),
        steps_mean=float(steps.mean()), steps_max=int(steps.max()),
        waste_production_order=round(waste(steps, 64), 3),
        waste_sorted_oracle=round(waste(np.sort(steps), 64), 3),
        waste_sorted_by_n_na=round(
            waste(steps[np.argsort(nna, kind="stable")], 64), 3),
        corr_steps_nna=round(float(np.corrcoef(steps, nna)[0, 1]), 3),
    )
    print(out)


if __name__ == "__main__":
    main()
