"""Quick interpret-mode parity check: h1_diagrams_pallas vs h1_diagrams."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tda_eeg_audio_tpu.runtime import force_cpu
force_cpu()
import jax.numpy as jnp
from scipy.ndimage import uniform_filter1d

from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams
from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas


def corr_dm(rng, n=47, t=250, smooth=12):
    X = uniform_filter1d(rng.standard_normal((n, t)), smooth, axis=1)
    r = np.corrcoef(X)
    dm = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
    np.fill_diagonal(dm, 0)
    return dm


def compare(dms, n, thresh, g_cap, n_pts=None, tag=""):
    a = {k: np.array(v) for k, v in h1_diagrams(
        jnp.asarray(dms), None if n_pts is None else jnp.asarray(n_pts),
        n=n, thresh=thresh).items()}
    b = {k: np.array(v) for k, v in h1_diagrams_pallas(
        jnp.asarray(dms), None if n_pts is None else jnp.asarray(n_pts),
        n=n, thresh=thresh, g_cap=g_cap, interpret=True).items()}
    assert not a["overflow"].any(), tag
    assert not b["overflow"].any(), (tag, b["overflow"])
    for i in range(len(dms)):
        ga = np.stack([a["births"][i][a["mask"][i]],
                       a["deaths"][i][a["mask"][i]]], 1)
        gb = np.stack([b["births"][i][b["mask"][i]],
                       b["deaths"][i][b["mask"][i]]], 1)
        assert len(ga) == len(gb), (tag, i, len(ga), len(gb))
        np.testing.assert_allclose(np.sort(gb, 0), np.sort(ga, 0), atol=1e-6,
                                   err_msg=f"{tag} window {i}")
    np.testing.assert_array_equal(a["n_essential"], b["n_essential"], tag)
    np.testing.assert_allclose(
        np.where(np.isfinite(a["h0_deaths"]), a["h0_deaths"], -1),
        np.where(np.isfinite(b["h0_deaths"]), b["h0_deaths"], -1),
        atol=0, err_msg=tag)
    print(f"OK {tag}: bars "
          f"{[int(m.sum()) for m in a['mask']]}, steps a={a['steps']} "
          f"b={b['steps']}")


rng = np.random.default_rng(0)
# EEG-shaped 47-pt correlation distance matrices
dms = np.stack([corr_dm(rng) for _ in range(3)]).astype(np.float32)
compare(dms, 47, 2.0, g_cap=1152, tag="eeg47")

# circle with essential class, truncated threshold
th = np.linspace(0, 2 * np.pi, 18, endpoint=False)
pts = np.stack([np.cos(th), np.sin(th)], 1)
diff = pts[:, None] - pts[None, :]
dmc = np.sqrt((diff ** 2).sum(-1)).astype(np.float32)[None]
compare(dmc, 18, 1.0, g_cap=256, tag="circle18")

# padded points (n_pts)
full = np.full((2, 24, 24), 9.0, np.float32)
for b in range(2):
    k = 20 - b
    d = corr_dm(rng, n=k, t=120)
    full[b, :k, :k] = d
    np.fill_diagonal(full[b], 0)
compare(full, 24, 2.0, g_cap=384, n_pts=np.array([20, 19], np.int32),
        tag="padded")
print("all parity checks passed")
