"""Test harness: force an 8-virtual-device CPU backend BEFORE jax initializes.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md §4): JAX's fake multi-device CPU backend exercises the same Mesh/
pjit sharding code paths the real pod uses. The axon sitecustomize in this
image force-registers the TPU platform, so we also override jax_platforms
in-process.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
