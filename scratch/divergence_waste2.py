"""Divergence waste under the REAL production chunk grouping + cheap keys.

The fused features program at tuning (eeg_batch=32, tda_chunk=64) forms each
lockstep call from chunk_m = 2 adjacent M-columns x all 32 recordings of the
batch (programs.eeg_feature_program: chunk axis = window axis, batch axis
preserved).  divergence_waste.py measured 2.29x waste for a DIFFERENT
grouping (64 consecutive windows of the per-recording flattened order); this
script measures the real grouping and the achievable reduction from sorting
by two keys:

  * n_na   (needs full phase 1 -- ranks + forest + sieve)
  * m_cx   (edge count <= min(thresh, enclosing radius): one compare-sum,
            no sort -- implementable as a pre-pass key at ~zero cost)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from sim_rounds import simulate


def eeg_window_grid(n_rec=32, K=8):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.study import StudyRunner

    ds = SynthDataset(n_subjects=max(2, n_rec // 4), n_per_subject=4)
    runner = StudyRunner(ds, cfg, verbose=False)
    grid = {}                       # (rec, band, k) -> dm
    for i in range(min(n_rec, len(ds))):
        dist, wmask, _ = runner.eeg_distances([i])
        d = np.asarray(dist[0])     # (5, W, 47, 47)
        nw = d.shape[1]
        take = np.linspace(0, nw - 1, min(K, nw)).astype(int)
        for bd in range(5):
            for kk, k in enumerate(take):
                grid[(i, bd, kk)] = d[bd, k]
    return grid, min(n_rec, len(ds)), K


def waste_chunks(steps_by_chunk):
    tot_max = sum(max(c) * len(c) for c in steps_by_chunk)
    tot_sum = sum(sum(c) for c in steps_by_chunk)
    return tot_max / tot_sum


def main():
    t0 = time.time()
    grid, R, K = eeg_window_grid()
    print(f"{len(grid)} windows from {R} recs ({time.time()-t0:.0f}s)",
          file=sys.stderr)
    stats = {key: simulate(dm) for key, dm in grid.items()}
    steps = {k: v["seq_steps"] for k, v in stats.items()}
    # m_cx without ranks: count of edges <= min(thresh, renc)
    mcx = {k: v["m_cx"] for k, v in stats.items()}
    nna = {k: v["n_na"] for k, v in stats.items()}

    # real grouping: chunks = 2 adjacent M-columns x all R recordings
    # (M order is band-major: column index = band * K + k)
    real_chunks = []
    for bd in range(5):
        for k0 in range(0, K, 2):
            real_chunks.append([steps[(r, bd, kk)]
                                for r in range(R)
                                for kk in (k0, min(k0 + 1, K - 1))])
    s_all = np.array(list(steps.values()))
    keys = list(steps.keys())

    def sorted_waste(keyfn, chunk=2 * R):
        order = sorted(keys, key=keyfn)
        ss = [steps[k] for k in order]
        return waste_chunks([ss[i:i + chunk]
                             for i in range(0, len(ss), chunk)])

    out = dict(
        n_windows=len(grid),
        steps_mean=round(float(s_all.mean()), 1),
        waste_real_grouping=round(waste_chunks(real_chunks), 3),
        waste_sorted_oracle=round(sorted_waste(lambda k: steps[k]), 3),
        waste_sorted_n_na=round(sorted_waste(lambda k: nna[k]), 3),
        waste_sorted_m_cx=round(sorted_waste(lambda k: mcx[k]), 3),
        corr_steps_nna=round(float(np.corrcoef(
            s_all, [nna[k] for k in keys])[0, 1]), 3),
        corr_steps_mcx=round(float(np.corrcoef(
            s_all, [mcx[k] for k in keys])[0, 1]), 3),
    )
    print(out)


if __name__ == "__main__":
    main()
