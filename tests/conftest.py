"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test
process; pytest imports conftest.py before collecting test modules.
"""
import os

# Force CPU: the machine env pins JAX_PLATFORMS=axon (the real TPU), and
# tests must not contend with benchmarks for the single chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
