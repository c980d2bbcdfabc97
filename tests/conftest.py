"""Test harness: run everything on a virtual 8-device CPU mesh.

The session's sitecustomize pre-imports jax and pins the TPU ('axon')
platform, so plain env vars are too late; ``jax.config.update`` still
works as long as no backend has been initialized, and XLA_FLAGS is read
at backend init (SURVEY.md §4e: multi-host tests without a pod via
``--xla_force_host_platform_device_count``).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, not the shared TPU"
    )
    assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(777)
