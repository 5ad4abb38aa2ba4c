"""Test env: run JAX on a virtual 8-device CPU mesh (multi-chip sharding tests
run here; the driver separately validates on real TPU via __graft_entry__).

NOTE: under the axon TPU plugin the JAX_PLATFORMS *env var* is ignored — the
platform must be forced via jax.config before any backend is initialized.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
