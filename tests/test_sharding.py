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
    B = 4
    T = 250 + (n_win_max - 1) * 62
    rng = np.random.default_rng(0)
    eeg = rng.standard_normal((B, 47, T)).astype(np.float32)
    ns = np.full((B,), T, np.int32)
    um = np.ones((B, 5, n_win_max), bool)
    return eeg, ns, um, n_win_max


def _run(mesh, tiny_batch):
    from jax.sharding import NamedSharding, PartitionSpec as P

    eeg, ns, um, n_win_max = tiny_batch
    step = sharded_feature_step(mesh, DEFAULT_CONFIG, n_win_max, tda_chunk=16)
    eeg_d = jax.device_put(jnp.asarray(eeg),
                           NamedSharding(mesh, P("dp", None, None)))
    ns_d = jax.device_put(jnp.asarray(ns), NamedSharding(mesh, P("dp")))
    um_d = jax.device_put(jnp.asarray(um),
                          NamedSharding(mesh, P("dp", None, None)))
    return np.array(step(eeg_d, ns_d, um_d))


def test_sharded_matches_single_device(tiny_batch):
    assert len(jax.devices()) >= 8, "conftest must force an 8-device mesh"
    ref = _run(make_mesh(1), tiny_batch)
    for n_dev, dp, wp in ((4, 2, 2), (8, 4, 2)):
        got = _run(make_mesh(n_dev, dp=dp, wp=wp), tiny_batch)
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
