"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The machine environment pins JAX_PLATFORMS=axon (the single real TPU)
and a sitecustomize imports jax at interpreter startup, so env-var
edits here are too late — the platform must be forced through
jax.config after import. XLA_FLAGS is still unread at this point (the
CPU client spins up lazily), so the 8-device host platform flag works.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    # fail fast if the TPU backend leaked into the test session
    assert jax.devices()[0].platform == "cpu", jax.devices()
