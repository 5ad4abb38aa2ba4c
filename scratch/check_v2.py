"""CPU interpret-mode parity: pallas_v2 vs the XLA lockstep backend."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams
from pallas_v2 import h1_diagrams_pallas_v2


def bars(o, i):
    b = np.asarray(o["births"][i])[np.asarray(o["mask"][i])]
    d = np.asarray(o["deaths"][i])[np.asarray(o["mask"][i])]
    return np.sort(np.stack([b, d], 1), 0)


def main():
    rng = np.random.default_rng(7)
    for n, B in ((12, 24), (20, 16), (28, 8)):
        pts = rng.standard_normal((B, n, 3)).astype(np.float32)
        dm = np.linalg.norm(pts[:, :, None] - pts[:, None], axis=-1)
        npts = np.full(B, n, np.int32)
        npts[0] = max(4, n - 3)
        dmj = jnp.asarray(dm)
        npj = jnp.asarray(npts)
        a = h1_diagrams(dmj, npj, n=n, thresh=10.0, na_max=64, h1_max=64,
                        step_budget=4096)
        b = h1_diagrams_pallas_v2(dmj, npj, n=n, thresh=10.0, na_max=64,
                                  h1_max=64, step_budget=4096,
                                  interpret=True)
        bad = 0
        for i in range(B):
            if np.asarray(a["overflow"][i]) or np.asarray(b["overflow"][i]):
                continue
            ga, gb = bars(a, i), bars(b, i)
            if ga.shape != gb.shape or not np.allclose(ga, gb, atol=1e-5):
                bad += 1
                if bad < 3:
                    print(f"n={n} i={i}\n A={ga}\n B={gb}")
        print(f"n={n} B={B}: mismatches {bad}")


if __name__ == "__main__":
    main()
