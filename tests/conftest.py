"""Test harness config: force CPU with 8 virtual devices for sharding tests.

Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# parity tests compare float32 against torch — keep matmuls/convs full precision
jax.config.update("jax_default_matmul_precision", "highest")
