"""Test harness: 8 virtual CPU devices so the multi-device SPMD path is exercised
without TPU hardware (the reference tests multi-rank behavior only on clusters;
we make it a unit-test concern, SURVEY.md §4).

Note: the session may preload a TPU jax plugin via sitecustomize with
``JAX_PLATFORMS`` already captured at interpreter start, so setting the env var
here is not enough — we update the jax config directly (backends are resolved
lazily, so this works as long as no device was touched yet).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got "
        f"{jax.devices()[0].platform}"
    )
    assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
