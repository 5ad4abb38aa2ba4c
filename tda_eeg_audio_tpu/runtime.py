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
