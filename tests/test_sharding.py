"""Multi-chip tests on the virtual 8-device CPU mesh (conftest.py): the
sharded study step must match the single-device computation bit-for-bit
after gather (SURVEY §4 test strategy)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

# compile-heavy (shard_map programs, minutes cold on CPU); the driver's
# dryrun_multichip covers the same path on every round
pytestmark = pytest.mark.slow

from tda_eeg_audio_tpu.config import DEFAULT_CONFIG
from tda_eeg_audio_tpu.parallel.sharding import (make_mesh,
                                                 sharded_feature_step,
                                                 sharded_stats_step)


@pytest.fixture(scope="module")
def tiny_batch():
    n_win_max = 16
    B, K = 4, 9
    T = 250 + (n_win_max - 1) * 62
    rng = np.random.default_rng(0)
    eeg = rng.standard_normal((B, 47, T)).astype(np.float32)
    ns = np.full((B,), T, np.int32)
    # md5-style random window subsample (VERDICT r2 weak #2: sampling must
    # survive sharding)
    ui = np.stack([rng.choice(n_win_max, K, replace=False)
                   for _ in range(B * 5)]).reshape(B, 5, K).astype(np.int32)
    um = np.ones((B, 5, K), bool)
    return eeg, ns, ui, um, n_win_max


def _run(mesh, tiny_batch):
    from tda_eeg_audio_tpu.parallel.sharding import shard_batch

    eeg, ns, ui, um, n_win_max = tiny_batch
    step = sharded_feature_step(mesh, DEFAULT_CONFIG, n_win_max, tda_chunk=16)
    return np.array(step(*shard_batch(mesh, eeg, ns, ui, um)))


def test_sharded_matches_single_device(tiny_batch):
    assert len(jax.devices()) >= 8, "conftest must force an 8-device mesh"
    ref = _run(make_mesh(1), tiny_batch)
    for n_dev, dp, wp in ((4, 2, 2), (8, 4, 2)):
        got = _run(make_mesh(n_dev, dp=dp, wp=wp), tiny_batch)
        np.testing.assert_array_equal(got, ref)


def test_production_feature_program_sharded_matches(tiny_batch):
    """The PRODUCTION fused feature program (models.programs.
    eeg_feature_program), GSPMD-partitioned over a dp mesh exactly as
    StudyRunner._put places it, must match the single-device run
    bit-for-bit — including the md5-sampled use_idx selection."""
    from jax.sharding import Mesh
    from tda_eeg_audio_tpu.models.programs import eeg_feature_program
    from tda_eeg_audio_tpu.parallel.sharding import shard_batch

    eeg, ns, ui, um, n_win_max = tiny_batch
    K = ui.shape[-1]
    ref_agg, ref_ovf = eeg_feature_program(
        jnp.asarray(eeg), jnp.asarray(ns), jnp.asarray(ui), jnp.asarray(um),
        DEFAULT_CONFIG, n_win_max, K, chunk=16)
    for dp in (2, 4):
        mesh = Mesh(np.array(jax.devices()[:dp]), ("dp",))
        agg, ovf = eeg_feature_program(
            *shard_batch(mesh, eeg, ns, ui, um),
            DEFAULT_CONFIG, n_win_max, K, chunk=16)
        np.testing.assert_array_equal(np.array(agg), np.array(ref_agg))
        np.testing.assert_array_equal(np.array(ovf), np.array(ref_ovf))


def test_sharded_study_rows_match_single_device():
    """The PRODUCTION study path through StudyRunner(mesh=...) — the same
    compute_feature_dataset the CLI runs — must emit the identical X matrix
    on a dp mesh as on one device (VERDICT r2 next #2 'Done' criterion)."""
    from jax.sharding import Mesh
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.study import StudyRunner

    ds = SynthDataset(n_subjects=2, n_per_subject=1)
    single = StudyRunner(ds, DEFAULT_CONFIG, eeg_batch=4, tda_chunk=64,
                         verbose=False)
    X1, y1, s1, fn1, m1 = single.compute_feature_dataset()
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    sharded = StudyRunner(ds, DEFAULT_CONFIG, eeg_batch=4, tda_chunk=64,
                          verbose=False, mesh=mesh)
    X2, y2, s2, fn2, m2 = sharded.compute_feature_dataset()
    assert list(fn1) == list(fn2) and list(y1) == list(y2)
    np.testing.assert_array_equal(X2, X1)


def test_production_comparison_program_sharded_matches():
    """The PRODUCTION fused comparison program (models.programs.
    comparison_program — 75+% of the study wall clock), GSPMD-partitioned
    over a dp mesh exactly as StudyRunner._put places it, must match the
    single-device run on every packed output (VERDICT r2 next #2)."""
    import dataclasses

    from jax.sharding import Mesh
    from tda_eeg_audio_tpu.models.programs import (audio_h1_program,
                                                   comparison_program,
                                                   pack_comparison_outputs)
    from tda_eeg_audio_tpu.parallel.sharding import shard_batch

    cfg = dataclasses.replace(DEFAULT_CONFIG, window_sec=0.2,
                              fir_numtaps=101)
    B, n_win_max, n_rs_max, K = 4, 12, 300, 5
    win, step = cfg.win_samples, cfg.step_samples
    rng = np.random.default_rng(3)
    n_e = (win + rng.integers(6, 10, B) * step).astype(np.int32)
    T = win + (n_win_max - 1) * step
    eeg = np.zeros((B, 47, T), np.float32)
    for i, n in enumerate(n_e):
        eeg[i, :, :n] = rng.standard_normal((47, n))
    n_a = (n_e * cfg.fs_audio // cfg.fs_eeg).astype(np.int32)
    audio = np.zeros((B, int(n_a.max())), np.float32)
    for i, n in enumerate(n_a):
        audio[i, :n] = rng.standard_normal(n)
    mis, n_mis = audio[::-1].copy(), n_a[::-1].copy()

    def run(mesh):
        def put(*xs):
            if mesh is None:
                return tuple(jnp.asarray(x) for x in xs)
            return shard_batch(mesh, *xs)

        mo = audio_h1_program(*put(mis, n_mis), cfg, n_rs_max, n_win_max,
                              K, aud_chunk=16)
        out = comparison_program(
            *put(eeg, n_e, audio, n_a),
            (mo["h1_b"], mo["h1_d"], mo["h1_m"]), mo["n_win"], mo["degen"],
            cfg, n_win_max, n_rs_max, K, eeg_chunk=16, aud_chunk=16)
        return np.array(pack_comparison_outputs(out))

    ref = run(None)
    for dp in (2, 4):
        got = run(Mesh(np.array(jax.devices()[:dp]), ("dp",)))
        np.testing.assert_array_equal(got, ref)


def test_sharded_stats_step(tiny_batch):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from scipy import stats as sps

    mesh = make_mesh(8, dp=8, wp=1)
    rng = np.random.default_rng(1)
    deltas = rng.standard_normal((16, 5)).astype(np.float32) + 0.4
    step = sharded_stats_step(mesh)
    out = np.array(step(jax.device_put(
        jnp.asarray(deltas), NamedSharding(mesh, P("dp", None)))))
    assert out.shape == (5, 2)
    for b in range(5):
        _, p_ref = sps.wilcoxon(deltas[:, b])
        np.testing.assert_allclose(out[b, 0], p_ref, rtol=1e-4)
