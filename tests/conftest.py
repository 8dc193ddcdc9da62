"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are validated
on XLA's host-platform device virtualization instead, exactly as the
driver's dryrun does.  The axon TPU plugin force-selects itself through
JAX_PLATFORMS, so the platform must be overridden via jax.config *after*
import, not through the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: identical test graphs compile once across
# runs, cutting suite wall time drastically on re-runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
