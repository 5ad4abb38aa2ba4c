"""flat vs gv lockstep layouts at n=47, timed with async dispatch and a
single fused readback (no per-chunk round-trip floor)."""
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

    def make(layout):
        @jax.jit
        def f(dm):
            o = h1_diagrams(dm, n=47, thresh=2.0, na_max=96, h1_max=96,
                            step_budget=8192, layout=layout)
            return (jnp.sum(jnp.where(o["mask"], o["births"], 0.0))
                    + jnp.sum(jnp.where(o["mask"],
                              jnp.where(jnp.isfinite(o["deaths"]),
                                        o["deaths"], 0.0), 0.0)))
        return f

    for layout in ("flat", "gv"):
        f = make(layout)
        s = jnp.stack([f(dm47[c*C:(c+1)*C]) for c in range(nc)])
        float(np.asarray(jnp.sum(s)))
        ts = []
        for _ in range(5):
            t0 = time.time()
            s = jnp.stack([f(dm47[c*C:(c+1)*C]) for c in range(nc)])
            chk = float(np.asarray(jnp.sum(s)))
            ts.append(time.time() - t0)
        results[layout] = dict(ms_per_window=round(1e3 * min(ts) / N, 4),
                               med=round(1e3 * float(np.median(ts)) / N, 4),
                               chk=round(chk, 1))
        print(layout, results[layout], file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
