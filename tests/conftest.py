"""Test harness: run JAX on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY §4 layering (d)).

The session interpreter registers the axon remote-TPU PJRT plugin from
sitecustomize before any conftest runs (and jax reads JAX_PLATFORMS=axon at
that import), so env vars alone cannot steer tests to CPU — override the
already-imported config instead. XLA_FLAGS is still read lazily at first
backend init, so the virtual device count works from here.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles dominate test wall time on this
# 2-vCPU box; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/phyngsc_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
