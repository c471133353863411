"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
(mesh/pjit/shard_map) is exercised without TPU hardware.

Note: the environment's sitecustomize registers the TPU ("axon") PJRT
plugin and imports jax at interpreter start, so JAX_PLATFORMS in os.environ
is captured before this file runs — the platform must be forced via
jax.config instead (safe because no backend has been *initialized* yet).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compilation cache: scans/RNN stacks are slow to compile on CPU;
# caching makes re-runs of the suite fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
