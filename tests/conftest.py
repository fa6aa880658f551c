"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4): the forced host
platform device count lets multi-chip sharding paths execute without TPU
hardware, and CPU float32 matches the TPU 'highest' matmul precision
closely enough for every golden tolerance used here.

This file must configure XLA before any jax import in the test session.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ivclab_tpu.utils import fixtures  # noqa: E402


@pytest.fixture(scope="session")
def lena():
    return fixtures.image("lena")


@pytest.fixture(scope="session")
def lena_small():
    return fixtures.image("lena_small")


@pytest.fixture(scope="session")
def sail():
    return fixtures.image("sail")


@pytest.fixture(scope="session")
def satpic1():
    return fixtures.image("satpic1")


@pytest.fixture(scope="session")
def lena_rec():
    return fixtures.degraded("lena")


@pytest.fixture(scope="session")
def foreman():
    return fixtures.video("foreman", num_frames=6)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
