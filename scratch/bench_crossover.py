"""Measure the pallas-vs-bitset H1 backend crossover at intermediate cloud
sizes (VERDICT r3 #5): h1_backend_auto routes on `n > 64`, previously
measured only at the study's two shapes (n=47 EEG, n=124 audio).  This
times both backends on Takens-like 3-D clouds at n in {48, 64, 80, 96,
124} so the routing constant is evidence-backed.

Run on the TPU:  python scratch/bench_crossover.py [n_windows=512]
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
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.ops import signal as tsig, geometry as tgeo
    from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams
    from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas

    print("devices:", jax.devices(), file=sys.stderr)
    NW = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.default_rng(0)

    for n in (48, 64, 80, 96, 124):
        # Takens-like clouds: delay-embedded band-limited noise, minmax'd —
        # the same geometry family the audio branch produces
        sig = rng.standard_normal((NW, n + 3 * 8)).cumsum(axis=1)
        pts = np.stack([sig[:, k * 4:k * 4 + n] for k in range(3)], axis=-1)
        pts = jnp.asarray(pts, jnp.float32)
        mask = jnp.ones(pts.shape[:2], bool)
        ptsn = tsig.minmax_normalize_points(pts, mask)
        dm = tgeo.pairwise_distances(ptsn, mask,
                                     pad_value=cfg.max_edge_length + 1.0)
        n_pts = jnp.full((NW,), n, jnp.int32)

        def timed(fn, reps=3):
            out = fn()
            jax.block_until_ready(out["births"])    # compile+warm
            best = np.inf
            for _ in range(reps):
                t0 = time.time()
                out = fn()
                jax.block_until_ready(out["births"])
                best = min(best, time.time() - t0)
            return best / NW * 1e3, out

        t_b, o_b = timed(lambda: h1_diagrams(
            dm, n_pts, n=n, thresh=cfg.max_edge_length,
            na_max=96, h1_max=96, step_budget=8192))
        t_p, o_p = timed(lambda: h1_diagrams_pallas(
            dm, n_pts, n=n, thresh=cfg.max_edge_length,
            na_max=96, h1_max=96, step_budget=8192))
        same = bool(jnp.all(
            (jnp.where(o_b["mask"], o_b["births"], 0)
             == jnp.where(o_p["mask"], o_p["births"], 0))
            & (o_b["mask"] == o_p["mask"])))
        print(f"n={n:4d}  bitset {t_b:7.3f} ms/win   pallas {t_p:7.3f} "
              f"ms/win   winner={'pallas' if t_p < t_b else 'bitset'}"
              f"   bars-match={same}", flush=True)


if __name__ == "__main__":
    main()
