"""Runtime/config helpers: persistent compilation cache + device selection.

The axon TPU backend compiles large while_loop programs slowly (minutes); the
persistent compilation cache makes every run after the first start instantly.
NOTE: the axon plugin ignores the JAX_PLATFORMS *environment variable* — CPU
must be forced via jax.config before first backend use.
"""

from __future__ import annotations

import os
from pathlib import Path

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    cache_dir = path or os.environ.get(
        "TDA_TPU_CACHE", str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches",
                          "xla_gpu_per_fusion_autotune_cache_dir")
    except Exception:
        pass
    _CACHE_ENABLED = True


def force_cpu() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")


_DISTRIBUTED = False


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> dict:
    """Multi-host initialization — the DCN data-parallel entry (SURVEY §2.3).

    The reference scales across machines only via env-var batch slicing with
    filesystem-mediated partials (tda_eeg_classification_v2.py:54-60,608-668).
    Here multi-host runs are first-class: each process calls this once, then
    `parallel.sharding.make_mesh()` builds a GLOBAL mesh over all hosts'
    devices — "dp" spans hosts over DCN, "wp" stays intra-host over ICI —
    and the sharded study steps run unchanged (shard_map is SPMD over the
    global mesh; feature gathers ride DCN, window gathers ride ICI).

    Arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or, on
    managed TPU pods, to automatic cluster detection.  Single-process calls
    (num_processes == 1 or nothing configured) are a no-op so the same entry
    point works everywhere.

    Returns {"process_id", "num_processes", "local_devices", "devices"}.
    """
    global _DISTRIBUTED
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    multi = (num_processes or 1) > 1 or coordinator is not None
    if multi and not _DISTRIBUTED:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
        _DISTRIBUTED = True
    return dict(process_id=jax.process_index(),
                num_processes=jax.process_count(),
                local_devices=len(jax.local_devices()),
                devices=len(jax.devices()))


def process_shard(n_items: int) -> tuple[int, int]:
    """This process's [start, end) slice of an n_items work list — the
    multi-process replacement for the reference's manual BATCH_START/
    BATCH_END env vars: deterministic, balanced, gap-free."""
    import jax

    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n_items // np_)
    return min(p * per, n_items), min((p + 1) * per, n_items)
