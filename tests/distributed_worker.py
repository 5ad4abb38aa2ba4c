"""Worker for tests/test_distributed.py: one emulated host of a 2-process
jax.distributed cluster (4 CPU devices each, gloo collectives over
localhost — the DCN stand-in this deployment allows).

Run: python tests/distributed_worker.py <coordinator> <num_procs> <pid>
Prints one JSON line the parent test asserts on.
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    coordinator, num_procs, pid = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]))
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()
    import jax
    # the axon plugin ignores JAX_PLATFORMS (see runtime.force_cpu);
    # cross-process CPU collectives need gloo (default "none" rejects them)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np
    from tda_eeg_audio_tpu import runtime
    from tda_eeg_audio_tpu.parallel.sharding import (
        make_mesh, sharded_stats_step)

    info = runtime.init_distributed(coordinator=coordinator,
                                    num_processes=num_procs, process_id=pid)

    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(info["devices"], dp=info["devices"], wp=1)
    # global (S, 5) deltas sharded over dp ACROSS the processes: each
    # process contributes its local quarter rows
    S = info["devices"] * 2
    full = np.arange(S * 5, dtype=np.float32).reshape(S, 5) / 7.0
    sh = NamedSharding(mesh, P("dp", None))
    local_rows = full[pid * (S // num_procs):(pid + 1) * (S // num_procs)]
    deltas = jax.make_array_from_process_local_data(sh, local_rows, (S, 5))
    out = sharded_stats_step(mesh)(deltas)       # (5, 2), fully replicated
    out_h = np.asarray(jax.device_get(out))

    lo, hi = runtime.process_shard(10)
    print(json.dumps(dict(
        process_id=info["process_id"], num_processes=info["num_processes"],
        local_devices=info["local_devices"], devices=info["devices"],
        shard=[lo, hi], stats_checksum=round(float(out_h.sum()), 6),
        stats_shape=list(out_h.shape))), flush=True)


if __name__ == "__main__":
    main()
