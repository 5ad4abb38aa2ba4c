"""Split EEG-n=47 H1 cost into phase1 (rank matrix/sort/sieve/MST) vs
phase2 (lockstep reduction) on the real TPU, plus report chunk step
counts. Also times phase1 sub-stages by ablation."""
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
    from tda_eeg_audio_tpu.ops.homology_h1 import _phase1, h1_diagrams
    from functools import partial

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    from scipy.ndimage import uniform_filter1d
    dml = []
    for _ in range(2048):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dm47 = jnp.asarray(np.stack(dml).astype(np.float32))
    C = 256
    nc = 2048 // C
    results = {}

    p1 = jax.jit(partial(_phase1, n=47, thresh=2.0, na_max=96))

    def run(f, tag, reduce_keys=None):
        outs = [f(dm47[c*C:(c+1)*C]) for c in range(nc)]
        jax.block_until_ready(outs)
        # force full materialization via readback of a scalar per chunk
        float(sum(np.asarray(o["m_cx" if "m_cx" in o else "births"]).sum()
                  for o in outs))
        ts = []
        for _ in range(3):
            t0 = time.time()
            outs = [f(dm47[c*C:(c+1)*C]) for c in range(nc)]
            float(sum(np.asarray(o["m_cx" if "m_cx" in o else "births"]).sum()
                      for o in outs))
            ts.append(time.time() - t0)
        results[tag] = dict(ms_per_window=round(1e3 * min(ts) / 2048, 4))
        print(tag, results[tag], file=sys.stderr)
        return outs

    full = run(lambda d: h1_diagrams(d, n=47, thresh=2.0, na_max=96,
                                     h1_max=96, step_budget=8192), "full")
    results["steps_per_chunk"] = [int(np.asarray(o["steps"])) for o in full]
    print("steps:", results["steps_per_chunk"], file=sys.stderr)
    run(p1, "phase1")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
