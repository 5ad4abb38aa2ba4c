"""Where does the audio H1 time go?  phase1 vs lockstep loop, and chunk
divergence.  Runs h1_diagrams at several (chunk, step_budget) points and
reports per-window ms + lockstep step counts."""
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
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.programs import audio_takens_program
    from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams

    ds = SynthDataset(n_subjects=2, n_per_subject=4)
    B = 8
    T_A = 44100 * 24
    audio = np.zeros((B, T_A), np.float32)
    ns = np.zeros(B, np.int32)
    for i in range(B):
        rec = ds.load(i)
        n = min(len(rec["audio"]), T_A)
        audio[i, :n] = rec["audio"][:n]
        ns[i] = n
    aud = audio_takens_program(jnp.asarray(audio), jnp.asarray(ns), cfg,
                               5900, 90, 15)
    P = cfg.max_takens_points
    dm = np.asarray(aud["dm"]).reshape(-1, P, P)
    npts = np.asarray(aud["n_pts"]).reshape(-1).astype(np.int32)
    km = np.asarray(aud["wmask"])
    valid = np.repeat(km[:, None, :], 5, 1).reshape(-1)
    dm, npts = dm[valid], npts[valid]
    N = len(dm)

    results = {}
    for C in (16, 64):
        nchunk = N // C
        dm_d = jnp.asarray(dm[: nchunk * C])
        np_d = jnp.asarray(npts[: nchunk * C])
        for budget in (1, 8192):
            def run():
                outs = []
                for c in range(nchunk):
                    outs.append(h1_diagrams(
                        dm_d[c * C:(c + 1) * C], np_d[c * C:(c + 1) * C],
                        n=P, thresh=cfg.max_edge_length, na_max=96,
                        h1_max=96, step_budget=budget))
                jax.block_until_ready(outs)
                return outs
            outs = run()       # compile
            t0 = time.time(); outs = run(); dt = time.time() - t0
            steps = [int(np.asarray(o["steps"])) for o in outs]
            nna = np.concatenate([np.asarray(o["n_na"]) for o in outs])
            results[f"chunk{C}_budget{budget}"] = dict(
                ms_per_window=round(1e3 * dt / (nchunk * C), 3),
                steps_mean=float(np.mean(steps)),
                steps_max=int(np.max(steps)),
                n_na_mean=float(nna.mean()), n_na_max=int(nna.max()))
            print(f"chunk{C}_budget{budget}",
                  results[f"chunk{C}_budget{budget}"], file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
