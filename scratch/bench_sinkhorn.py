"""Component timing: sinkhorn_cost at the comparison-stage shapes, and the
EEG window_tda_features path, to attribute the fused-comparison wall clock."""
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
    from tda_eeg_audio_tpu.ops.wasserstein import build_cost_matrix, sinkhorn_cost

    rng = np.random.default_rng(0)
    results = {}

    def diag(B, K, nreal):
        b = rng.random((B, K), dtype=np.float32)
        d = b + rng.random((B, K), dtype=np.float32) * 0.5
        m = np.arange(K)[None, :] < nreal
        m = np.broadcast_to(m, (B, K)).copy()
        return jnp.asarray(b), jnp.asarray(d), jnp.asarray(m)

    for tag, K1, K2, n1, n2 in (("h1_256", 128, 128, 30, 25),
                                ("h0_192", 64, 128, 46, 110),
                                ("h1_128", 64, 64, 30, 25)):
        B = 512
        b1, d1, m1 = diag(B, K1, n1)
        b2, d2, m2 = diag(B, K2, n2)

        @jax.jit
        def run(b1=b1, d1=d1, m1=m1, b2=b2, d2=d2, m2=m2):
            D = build_cost_matrix(b1, d1, m1, b2, d2, m2)
            return sinkhorn_cost(D)

        out = run(); jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.time(); out = run(); jax.block_until_ready(out)
            ts.append(time.time() - t0)
        results[tag] = dict(us_per_pair=round(1e6 * min(ts) / B, 1))
        print(tag, results[tag], file=sys.stderr)

    # EEG H1 at the fused-comparison config
    from scipy.ndimage import uniform_filter1d
    from tda_eeg_audio_tpu.models.programs import window_tda_features
    dml = []
    for _ in range(512):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dm = jnp.asarray(np.stack(dml).astype(np.float32))

    @jax.jit
    def eeg(dm=dm):
        f, out = window_tda_features(dm, thresh=2.0, na_max=128, h1_max=128,
                                     step_budget=4096)
        return f, out["births"]

    out = eeg(); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.time(); out = eeg(); jax.block_until_ready(out)
        ts.append(time.time() - t0)
    results["eeg_h1_512"] = dict(us_per_window=round(1e6 * min(ts) / 512, 1))
    print("eeg", results["eeg_h1_512"], file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
