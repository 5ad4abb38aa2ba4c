"""Multi-host (DCN) emulation test: a real 2-process jax.distributed
cluster on localhost — 4 CPU devices per process, gloo collectives —
through runtime.init_distributed, a GLOBAL dp mesh, and the sharded
stats step with rows contributed by different processes.

This executes the package's multi-host entry end-to-end (SURVEY §2.3:
"dp spans hosts over DCN"), which the virtual-mesh dryrun alone cannot:
here the collective actually crosses process boundaries.  Reference
counterpart: env-var batch slicing + filesystem partial merging
(tda_eeg_classification_v2.py:54-60,608-668).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
WORKER = ROOT / "tests" / "distributed_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster_matches_single_process():
    # bounded by the communicate(timeout=240) below, not a pytest plugin
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=str(ROOT)) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["process_id"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert o["num_processes"] == 2
        assert o["local_devices"] == 4
        assert o["devices"] == 8
        assert o["stats_shape"] == [5, 2]
    # deterministic, balanced, gap-free process_shard split
    assert by_pid[0]["shard"] == [0, 5]
    assert by_pid[1]["shard"] == [5, 10]
    # the psum-reduced stats are REPLICATED: both hosts see the same value
    assert by_pid[0]["stats_checksum"] == by_pid[1]["stats_checksum"]

    # ground truth: the identical computation single-process on the
    # test session's own virtual 8-device mesh
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tda_eeg_audio_tpu.parallel.sharding import (
        make_mesh, sharded_stats_step)
    if jax.device_count() < 8:
        pytest.skip("needs the conftest 8-device virtual mesh")
    mesh = make_mesh(8, dp=8, wp=1)
    S = 16
    full = np.arange(S * 5, dtype=np.float32).reshape(S, 5) / 7.0
    deltas = jax.device_put(full, NamedSharding(mesh, P("dp", None)))
    ref = np.asarray(sharded_stats_step(mesh)(deltas))
    assert by_pid[0]["stats_checksum"] == pytest.approx(float(ref.sum()),
                                                        abs=1e-5)
