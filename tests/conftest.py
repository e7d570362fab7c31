"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so every sharded code path
(pjit data-parallel train step, cross-device psum, eval gather) is exercised
without TPU hardware, mirroring how the reference exercised its distributed
code at world_size==1 (SURVEY.md §4).
"""
import os

# Must be set before jax is imported anywhere. Force-override: the ambient
# environment pins JAX_PLATFORMS=axon (the tunneled TPU), which has a single
# chip and very slow per-op dispatch — tests always run on the virtual CPU
# mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon (tunneled TPU)
# backend and sets jax_platforms="axon,cpu"; backends initialize lazily, so
# re-pin to CPU before first device use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: repeated pytest runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/ovmono3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
