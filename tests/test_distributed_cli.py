"""2-process CLI features run: automatic shard slicing + partials + merge.

Each process of a real jax.distributed cluster (localhost coordinator,
CPU) runs `cli features`, which detects process_count() > 1, takes its
deterministic recording slice (runtime.process_shard), and writes a
partial; `--merge-partials` then reconstructs the dataset, asserted
byte-identical to a single-process run.  This executes the reference's
BATCH_START/BATCH_END + merge contract
(tda_eeg_classification_v2.py:54-60,608-668) in its automated
multi-process form, end to end through the CLI.

Slow tier: three subprocess CPU feature compiles (shared .jax_cache).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
slow = pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                          reason="set RUN_SLOW=1 (subprocess CPU compiles)")

FLAGS = ["features", "--device", "cpu", "--no-store", "--subjects", "3",
         "--per-subject", "2", "--batch", "4", "--chunk", "16"]


def _cli(extra, cwd):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    return subprocess.Popen(
        [sys.executable, "-m", "tda_eeg_audio_tpu.cli", *extra],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=str(cwd))


@slow
def test_two_process_cli_features_partials_merge(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    shared = tmp_path / "multi"
    procs = [_cli(FLAGS + ["--results", str(shared),
                           "--coordinator", f"127.0.0.1:{port}",
                           "--num-processes", "2", "--process-id", str(i)],
                  ROOT) for i in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=1200)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        assert "process shard: recordings [" in out, out[-500:]
        assert "partial:" in out, out[-500:]
    parts = sorted((shared / "partials").glob("batch_*.npz"))
    assert len(parts) == 2

    p = _cli(["features", "--merge-partials", "--results", str(shared)], ROOT)
    out, err = p.communicate(timeout=300)
    assert p.returncode == 0, err[-2000:]

    single = tmp_path / "single"
    p = _cli(FLAGS + ["--results", str(single)], ROOT)
    out, err = p.communicate(timeout=1200)
    assert p.returncode == 0, err[-2000:]

    fd_m, fd_s = shared, single
    Xm, Xs = np.load(fd_m / "X.npy"), np.load(fd_s / "X.npy")
    assert Xm.shape == Xs.shape and Xm.shape[1] == 220 and len(Xm) >= 4
    np.testing.assert_array_equal(Xm, Xs)
    np.testing.assert_array_equal(np.load(fd_m / "y.npy"),
                                  np.load(fd_s / "y.npy"))
    np.testing.assert_array_equal(np.load(fd_m / "subjects.npy"),
                                  np.load(fd_s / "subjects.npy"))
