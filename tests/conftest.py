"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so every sharded code path
(pjit data-parallel train step, cross-device psum, eval gather) is exercised
without TPU hardware, mirroring how the reference exercised its distributed
code at world_size==1 (SURVEY.md §4).
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: repeated pytest runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
