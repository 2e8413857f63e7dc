"""Test configuration: force a virtual 8-device CPU mesh before jax imports.

Multi-chip hardware is not available in CI; sharding correctness is validated
on a host-platform device mesh (the same XLA collectives compile for real ICI).
"""

import os

# SDA_TEST_PLATFORM=native leaves the attached accelerator in place — the
# TPU test lane (ci.sh runs `-m tpu` with it) for the in-kernel PRNG paths
# that have no CPU interpret lowering.
_NATIVE = os.environ.get("SDA_TEST_PLATFORM") == "native"

if not _NATIVE:
    # The dev image's sitecustomize pre-imports jax with the axon remote-TPU
    # platform, so env vars alone are too late; force the CPU platform via the
    # config API (backends are not initialized yet at conftest time) or every
    # eager op becomes a network round trip through the TPU tunnel.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_disable_hlo_passes" not in flags:
        # XLA:CPU's algebraic simplifier enters its known circular-rewrite
        # loop on the 16-bit-limb mask/shift chains (it logs "likely stuck in
        # a circular simplification loop") and compile times explode; the
        # pass only helps runtime, which tests don't care about. (The TPU
        # backend NEEDS algsimp — do not disable it on the native lane.)
        flags = flags + " --xla_disable_hlo_passes=algsimp"
    os.environ["XLA_FLAGS"] = flags

import jax

if not _NATIVE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: exercises device-only kernel paths (in-kernel PRNG); "
        "self-skips on CPU — run with SDA_TEST_PLATFORM=native and a chip",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
