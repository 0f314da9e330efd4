"""Test configuration: simulated 8-device CPU mesh with x64.

The environment's sitecustomize imports jax at interpreter startup (axon TPU
plugin), so JAX_PLATFORMS env vars are captured before tests run; we must
force the platform through jax.config instead.  XLA_FLAGS is read at backend
initialization, which has not happened yet at conftest-import time.

Set PHANTOM_TEST_TPU=1 to run the suite on the real TPU instead.
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("PHANTOM_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: repeated suite runs skip recompiles of
# the u64-emulation graphs (the dominant cost of this suite on CPU).
jax.config.update("jax_compilation_cache_dir", "/tmp/phantom_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
