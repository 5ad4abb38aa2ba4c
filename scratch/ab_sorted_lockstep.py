"""Does sorting EEG windows by n_na (non-apparent creator count) before
chunked lockstep reduction cut the divergence waste?  (The round-2 attempt
sorted by in-complex EDGE count and saw identical step counts; n_na is the
direct predictor of reduction work.)"""
import json
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
    from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams, _phase1

    rng = np.random.default_rng(0)
    from scipy.ndimage import uniform_filter1d
    dml = []
    for _ in range(2048):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dms = jnp.asarray(np.stack(dml).astype(np.float32))
    N = len(dml)
    C = 256
    results = {}

    @jax.jit
    def n_na_of(dm):
        ph = _phase1(dm, 47, cfg.max_edge_length, 96)
        return jnp.sum(ph["na_list"] >= 0, axis=-1)

    def run(dm_in, tag):
        f = lambda c: h1_diagrams(dm_in[c * C:(c + 1) * C], n=47,
                                  thresh=cfg.max_edge_length, na_max=96,
                                  h1_max=96, step_budget=8192)
        outs = [f(c) for c in range(N // C)]
        jax.block_until_ready(outs)
        ts = []
        for _ in range(3):
            t0 = time.time()
            outs = [f(c) for c in range(N // C)]
            jax.block_until_ready(outs)
            ts.append(time.time() - t0)
        steps = [int(np.asarray(o["overflow"]).sum()) for o in outs]
        results[tag] = dict(ms_per_window=round(1e3 * min(ts) / N, 3),
                            overflow=sum(steps))
        print(tag, results[tag], file=sys.stderr)

    run(dms, "unsorted")
    t0 = time.time()
    nna = np.asarray(n_na_of(dms))
    order = np.argsort(nna, kind="stable")
    t_sort = time.time() - t0
    print(f"n_na: min {nna.min()} med {np.median(nna):.0f} max {nna.max()}; "
          f"phase1+sort {t_sort:.2f}s", file=sys.stderr)
    dms_sorted = jnp.asarray(np.asarray(dms)[order])
    run(dms_sorted, "sorted_by_n_na")
    results["n_na"] = dict(min=int(nna.min()), med=float(np.median(nna)),
                           max=int(nna.max()))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
