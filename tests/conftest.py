"""Test config: force CPU with a virtual 8-device mesh so sharding tests run
without TPU hardware (must run before jax initializes)."""

import os

# This image's sitecustomize imports jax at interpreter start (the axon TPU
# tunnel) and pins JAX_PLATFORMS=axon, so env vars set here are too late for
# import-time parsing; jax.config.update still works because no backend has
# been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "src", "benchmark"))


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="reference snapshot not mounted",
)


def torch_available() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except Exception:  # noqa: BLE001
        return False


requires_torch = pytest.mark.skipif(
    not torch_available(), reason="torch not available"
)
