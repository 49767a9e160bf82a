"""Test config: force an 8-device virtual CPU mesh before JAX initializes,
so data-parallel sharding paths are exercised without TPU hardware
(SURVEY.md §4: multi-chip tests via xla_force_host_platform_device_count)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment's sitecustomize may pin the TPU plugin platform; override
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"
TOY = os.path.join(REFERENCE, "toy_example")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


@pytest.fixture
def toy():
    if not reference_available():
        pytest.skip("reference toy example not available")
    return TOY
