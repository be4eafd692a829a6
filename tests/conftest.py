"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

The container's sitecustomize pre-imports jax and registers a remote
'axon' TPU backend (JAX_PLATFORMS=axon in the env); eager ops on it
round-trip a remote compiler, which is useless for tests.  Overriding via
jax.config before any backend is initialized pins tests to local CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Segmented scenario execution: membership and index share the similarity
# and compare jit segments (and approaches with equal shapes share compare
# compilations), so the suite compiles far less than with one monolithic
# XLA program per scenario.
os.environ.setdefault("IMTPU_FORCE_SEGMENTS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/imtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
