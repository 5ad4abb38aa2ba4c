"""Isolate _comparison_stats_program's device cost at production shapes.

The round-5 attribution charged it 0.0756 s/batch (B=16) — implausibly fat
for closed-form reductions over (B*25, 15) series.  Measure it standalone
(warm, async-dispatch, min of repeats) to split real compute from
attribution noise / dispatch overhead, and A/B the betainc-based t-tail.
"""
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
    from tda_eeg_audio_tpu.models import programs as P

    B, K = (int(sys.argv[1]) if len(sys.argv) > 1 else 32), 15
    N = B * 5 * K
    rng = np.random.default_rng(0)
    w = [jnp.asarray(rng.random(N, np.float32)) for _ in range(3)]
    ef = jnp.asarray(rng.random((N, 22), np.float32))
    af = jnp.asarray(rng.random((N, 22), np.float32))
    kmask = jnp.asarray(rng.random((B, K)) < 0.9)
    a_degen = jnp.asarray(rng.random((B, 5, K)) < 0.05)
    mis_degen = jnp.asarray(rng.random((B, 5, K)) < 0.05)
    n_win_e = jnp.full((B,), 40, jnp.int32)
    mis_n = jnp.full((B,), 12, jnp.int32)

    def run():
        out = P._comparison_stats_program(w[0], w[1], w[2], ef, af, kmask,
                                          a_degen, mis_degen, n_win_e,
                                          mis_n, K)
        return jax.block_until_ready(out["corr_r"])

    run()
    ts = []
    for _ in range(6):
        t0 = time.time()
        for _ in range(8):
            run()
        ts.append((time.time() - t0) / 8)
    print(f"stats program B={B}: {min(ts)*1e3:.2f} ms/call "
          f"(sync per call; includes 1 readback)")

    # async variant: 8 dispatches, one readback
    def run_async():
        outs = [P._comparison_stats_program(w[0], w[1], w[2], ef, af, kmask,
                                            a_degen, mis_degen, n_win_e,
                                            mis_n, K)["corr_r"]
                for _ in range(8)]
        return jax.block_until_ready(outs)

    run_async()
    ts = []
    for _ in range(6):
        t0 = time.time()
        run_async()
        ts.append((time.time() - t0) / 8)
    print(f"stats program B={B}: {min(ts)*1e3:.2f} ms/call (async x8)")


if __name__ == "__main__":
    main()
