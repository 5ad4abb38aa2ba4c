"""Parity: the per-window Pallas H1 kernel (interpret mode on CPU) vs the
XLA lockstep kernel and the exact oracle.  The two back ends share _phase1,
so bar-for-bar equality here pins the reduction loop itself."""
import numpy as np
import pytest
import jax.numpy as jnp

from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams
from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas
from tda_eeg_audio_tpu.oracle.persistence import rips_persistence_dm


def _bars(out, i):
    return np.stack([out["births"][i][out["mask"][i]],
                     out["deaths"][i][out["mask"][i]]], 1)


def _run_pair(dms, n, thresh, g_cap, n_pts=None, **kw):
    np_j = None if n_pts is None else jnp.asarray(n_pts)
    a = {k: np.array(v) for k, v in h1_diagrams(
        jnp.asarray(dms), np_j, n=n, thresh=thresh, **kw).items()}
    b = {k: np.array(v) for k, v in h1_diagrams_pallas(
        jnp.asarray(dms), np_j, n=n, thresh=thresh, g_cap=g_cap,
        interpret=True, **kw).items()}
    assert not a["overflow"].any() and not b["overflow"].any()
    for i in range(len(dms)):
        ga, gb = _bars(a, i), _bars(b, i)
        assert len(ga) == len(gb)
        np.testing.assert_allclose(np.sort(gb, 0), np.sort(ga, 0), atol=1e-6)
    np.testing.assert_array_equal(a["n_essential"], b["n_essential"])
    np.testing.assert_allclose(
        np.where(np.isfinite(a["h0_deaths"]), a["h0_deaths"], -1),
        np.where(np.isfinite(b["h0_deaths"]), b["h0_deaths"], -1), atol=0)
    return a, b


def test_pallas_circle_essential():
    """Truncated circle: one essential H1 class, matches oracle exactly."""
    th = np.linspace(0, 2 * np.pi, 18, endpoint=False)
    pts = np.stack([np.cos(th), np.sin(th)], 1)
    diff = pts[:, None] - pts[None, :]
    dm = np.sqrt((diff ** 2).sum(-1)).astype(np.float32)[None]
    a, b = _run_pair(dm, 18, 1.0, g_cap=256, na_max=64, h1_max=64,
                     step_budget=1024)
    ref = rips_persistence_dm(dm[0].astype(np.float64), thresh=1.0)[1]
    gb = _bars(b, 0)
    assert len(gb) == len(ref)
    assert np.isinf(gb[:, 1]).sum() == np.isinf(ref[:, 1]).sum() == 1


def test_pallas_padded_points():
    """n_pts masking + enclosing-radius truncation under padding."""
    rng = np.random.default_rng(7)
    from scipy.ndimage import uniform_filter1d

    full = np.full((2, 24, 24), 9.0, np.float32)
    for b in range(2):
        k = 20 - b
        X = uniform_filter1d(rng.standard_normal((k, 120)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        full[b, :k, :k] = d
        np.fill_diagonal(full[b], 0)
    _run_pair(full, 24, 2.0, g_cap=384, n_pts=np.array([20, 19], np.int32),
              na_max=64, h1_max=64, step_budget=2048)


def test_pallas_h1max_padding():
    """h1_max > internal na_max pads diagram buffers (the audio-path shape
    contract: VMEM caps na_max at 80 while callers size buffers by 96)."""
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((30, 3)).astype(np.float32)
    diff = pts[:, None] - pts[None, :]
    dm = np.sqrt((diff ** 2).sum(-1)).astype(np.float32)[None]
    b = {k: np.array(v) for k, v in h1_diagrams_pallas(
        jnp.asarray(dm), n=30, thresh=2.0, g_cap=512, na_max=48, h1_max=96,
        interpret=True).items()}
    assert b["births"].shape == (1, 96)
    ref = rips_persistence_dm(dm[0].astype(np.float64), thresh=2.0)[1]
    gb = _bars(b, 0)
    fin = np.isfinite(ref[:, 1])
    assert len(gb) == len(ref)
    np.testing.assert_allclose(np.sort(gb[np.isfinite(gb[:, 1])], 0),
                               np.sort(ref[fin], 0), atol=2e-5)


@pytest.mark.slow
def test_pallas_audio124_parity():
    """Audio-shaped Takens cloud (n=124, the production Pallas shape) vs
    the exact oracle, incl. enclosing-radius truncation + n_pts padding."""
    t = np.linspace(0, 6 * np.pi, 124)
    pts = np.stack([np.cos(t) + 0.1 * np.cos(5 * t),
                    np.sin(t) + 0.1 * np.sin(7 * t),
                    0.3 * np.sin(3 * t)], 1).astype(np.float32)
    lo, hi = pts.min(0), pts.max(0)
    pts = (pts - lo) / np.where(hi - lo > 0, hi - lo, 1.0)
    full = np.full((1, 124, 124), 9.0, np.float32)
    diff = pts[:118, None] - pts[None, :118]          # 6 padded points
    full[0, :118, :118] = np.sqrt((diff ** 2).sum(-1))
    np.fill_diagonal(full[0], 0)
    _, b = _run_pair(full, 124, 2.0, g_cap=7680,
                     n_pts=np.array([118], np.int32), na_max=80, h1_max=96)
    ref = rips_persistence_dm(
        np.sqrt((diff ** 2).sum(-1)).astype(np.float64), thresh=2.0)[1]
    gb = _bars(b, 0)
    fin = np.isfinite(ref[:, 1])
    gfin = gb[np.isfinite(gb[:, 1])]
    assert len(gb) == len(ref)
    np.testing.assert_allclose(np.sort(gfin, 0), np.sort(ref[fin], 0),
                               atol=2e-5)


@pytest.mark.slow
def test_pallas_eeg47_parity():
    """Full EEG-shaped windows, interpret mode (slow: ~600 interpreted
    reduction steps)."""
    rng = np.random.default_rng(11)
    from scipy.ndimage import uniform_filter1d

    dml = []
    for _ in range(2):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dms = np.stack(dml).astype(np.float32)
    a, _ = _run_pair(dms, 47, 2.0, g_cap=1152)
    for i in range(2):
        ref = rips_persistence_dm(dms[i].astype(np.float64), thresh=2.0)[1]
        np.testing.assert_allclose(np.sort(_bars(a, i), 0), np.sort(ref, 0),
                                   atol=2e-5)


def test_tiny_cloud_na_clamp_and_cpu_fallback():
    """m = n(n-1)/2 < na_max must not break padding (regression), and
    backend='pallas' on a non-TPU host must fall back to the portable
    kernel instead of failing in Mosaic."""
    from tda_eeg_audio_tpu.models.homology_exec import run_tda

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((12, 3)).astype(np.float32)
    d = np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1)).astype(np.float32)
    out = run_tda(d[None].repeat(4, 0), 2.0, backend="pallas", chunk=4)
    ref = rips_persistence_dm(d.astype(np.float64), thresh=2.0)[1]
    got = np.stack([out["births"][0][out["fin_mask"][0]],
                    out["deaths"][0][out["fin_mask"][0]]], 1)
    fin = np.isfinite(ref[:, 1])
    np.testing.assert_allclose(np.sort(got, 0), np.sort(ref[fin], 0),
                               atol=2e-5)
    # the pallas wrapper itself also clamps (interpret mode, m=66 < na=80)
    b = {k: np.array(v) for k, v in h1_diagrams_pallas(
        jnp.asarray(d[None]), n=12, thresh=2.0, na_max=80, h1_max=96,
        interpret=True).items()}
    assert b["births"].shape == (1, 96)


def test_run_tda_device_resident_input_matches_host():
    """run_tda must accept a device (jnp) batch and produce the same
    features/bars as the host-numpy path — the staged comparison/control
    paths hand it device-resident distance matrices to skip the host
    round trip (models/study.py)."""
    from tda_eeg_audio_tpu.models.homology_exec import run_tda

    rng = np.random.default_rng(3)
    dml = []
    for _ in range(5):
        pts = rng.standard_normal((20, 3)).astype(np.float32)
        d = np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dms = np.stack(dml).astype(np.float32)
    host = run_tda(dms, 2.0, backend="device", chunk=4)
    dev = run_tda(jnp.asarray(dms), 2.0, backend="device", chunk=4)
    for k in ("births", "deaths", "fin_mask", "features"):
        np.testing.assert_array_equal(np.asarray(host[k]), np.asarray(dev[k]))



def test_mosaic_lowering_device_free():
    """The production Mosaic kernel LOWERS for TPU on a CPU-only host
    (jax.export runs the Pallas→Mosaic lowering without a device) — this
    catches unsupported-primitive regressions (e.g. `rev`) without TPU
    hardware in the loop."""
    from functools import partial

    import jax
    from jax import export

    from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas

    f_d = partial(h1_diagrams_pallas, n=124, thresh=2.0, na_max=96,
                  h1_max=96, step_budget=8192)
    export.export(jax.jit(f_d), platforms=["tpu"])(
        jax.ShapeDtypeStruct((4, 124, 124), jnp.float32),
        jax.ShapeDtypeStruct((4,), jnp.int32))
