"""Test configuration: hermetic 8-device CPU "fake cluster".

All tests run on CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (the driver separately dry-run-compiles the
multi-chip path; benches run on the real chip).
"""

import os

# Force CPU even when a TPU tunnel platform is pre-configured in the env
# (the platform plugin registered in sitecustomize overrides JAX_PLATFORMS,
# so the jax.config update below is what actually pins the backend):
# the suite must be hermetic and expose 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
