"""Test harness config: force CPU with 8 virtual devices for sharding tests.

Must run before the first `import jax` anywhere in the test process.
"""

import os

# the image exports JAX_PLATFORMS=axon (the tunneled TPU) — tests must run on
# the 8-virtual-device CPU backend, so override rather than setdefault
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var — force via config
jax.config.update("jax_platforms", "cpu")

# parity tests compare float32 against torch — keep matmuls/convs full precision
jax.config.update("jax_default_matmul_precision", "highest")

# the test runner has a single 2.1 GHz core: persist compiled executables so
# reruns skip XLA compilation entirely
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
