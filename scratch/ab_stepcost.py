"""Marginal per-step cost + fixed intercept of the gv lockstep (n=47)
via a step_budget sweep, async dispatch, one fused readback."""
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
    from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams

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
    C, nc, N = 256, 8, 2048
    results = {}

    def make(budget):
        @jax.jit
        def f(dm):
            o = h1_diagrams(dm, n=47, thresh=2.0, na_max=96, h1_max=96,
                            step_budget=budget, layout="gv")
            return jnp.stack([jnp.sum(jnp.where(o["mask"], o["births"], 0.0)),
                              jnp.sum(o["steps"]).astype(jnp.float32)])
        return f

    for budget in (1, 96, 192, 8192):
        f = make(budget)
        s = jnp.stack([f(dm47[c*C:(c+1)*C]) for c in range(nc)])
        np.asarray(jnp.sum(s, axis=0))
        ts = []
        for _ in range(5):
            t0 = time.time()
            s = jnp.stack([f(dm47[c*C:(c+1)*C]) for c in range(nc)])
            tot = np.asarray(jnp.sum(s, axis=0))
            ts.append(time.time() - t0)
        results[str(budget)] = dict(
            ms_total=round(1e3 * min(ts), 2),
            steps_total=int(tot[1]),
            ms_per_window=round(1e3 * min(ts) / N, 4))
        print(budget, results[str(budget)], file=sys.stderr)
    # derive marginal cost: (t(8192) - t(192)) / (steps_true - 192) etc.
    print(json.dumps(results))


if __name__ == "__main__":
    main()
