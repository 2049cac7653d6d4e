"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use jax.sharding over these virtual devices, substituting for
real TPU slices (the reference has no distributed tests at all; see SURVEY.md section 4).

The container's sitecustomize pins JAX_PLATFORMS=axon (the tunneled TPU); tests override
to CPU both via the env var and jax.config, since the axon plugin may already be
registered by the time pytest imports this file.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
