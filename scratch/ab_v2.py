"""Same-process interleaved A/B on TPU: pallas_v2 (flag-packed single-reduce
pivot) vs the committed kernel, audio shape n=124, plus parity."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main():
    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.programs import audio_takens_program
    from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas as v1
    from pallas_v2 import h1_diagrams_pallas_v2 as v2

    print("devices:", jax.devices(), file=sys.stderr)
    B, C = 16, 256
    T_A = 44100 * 24
    ds = SynthDataset(n_subjects=4, n_per_subject=4)
    audio = np.zeros((B, T_A), np.float32)
    ns = np.zeros(B, np.int32)
    for i in range(B):
        rec = ds.load(i)
        nn = min(len(rec["audio"]), T_A)
        audio[i, :nn] = rec["audio"][:nn]
        ns[i] = nn
    aud = audio_takens_program(jnp.asarray(audio), jnp.asarray(ns), cfg,
                               5900, 90, 15)
    P = cfg.max_takens_points
    dm = np.asarray(aud["dm"]).reshape(-1, P, P)
    npts = np.asarray(aud["n_pts"]).reshape(-1).astype(np.int32)
    km = np.asarray(aud["wmask"])
    valid = np.repeat(km[:, None, :], 5, 1).reshape(-1)
    dm, npts = dm[valid], npts[valid]
    nchunk = len(dm) // C
    dm = jnp.asarray(dm[: nchunk * C])
    npts = jnp.asarray(npts[: nchunk * C])
    N = nchunk * C
    print(f"windows: {N}", file=sys.stderr)

    kw = dict(n=P, thresh=cfg.max_edge_length, na_max=96, h1_max=96,
              step_budget=8192)

    def sweep(f):
        outs = [f(dm[c * C:(c + 1) * C], npts[c * C:(c + 1) * C], **kw)
                for c in range(nchunk)]
        jax.block_until_ready(outs)
        return outs

    o2 = sweep(v2)
    o1 = sweep(v1)
    a = {k: np.asarray(v) for k, v in o1[0].items()}
    b = {k: np.asarray(v) for k, v in o2[0].items()}
    mism = 0
    for i in range(C):
        if a["overflow"][i] or b["overflow"][i]:
            continue
        ga = np.sort(np.stack([a["births"][i][a["mask"][i]],
                               a["deaths"][i][a["mask"][i]]], 1), 0)
        gb = np.sort(np.stack([b["births"][i][b["mask"][i]],
                               b["deaths"][i][b["mask"][i]]], 1), 0)
        if ga.shape != gb.shape or not np.allclose(ga, gb, atol=1e-5):
            mism += 1
    res = {"parity_mismatches": mism, "v2_ms": [], "v1_ms": []}
    for _ in range(4):
        t0 = time.time(); sweep(v2)
        res["v2_ms"].append(round(1e3 * (time.time() - t0) / N, 3))
        t0 = time.time(); sweep(v1)
        res["v1_ms"].append(round(1e3 * (time.time() - t0) / N, 3))
    res["v2_best"] = min(res["v2_ms"])
    res["v1_best"] = min(res["v1_ms"])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
