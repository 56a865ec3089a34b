"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path is
exercised without TPU hardware (the domain's "multi-node without a cluster"
answer — see SURVEY.md §4). Must run before the first `import jax`.
"""

import os

# The environment exports JAX_PLATFORMS=axon (the TPU tunnel) and the axon
# plugin re-asserts itself in jax.config — a plain env override is NOT enough.
# Force both the env var and the config so tests never touch the tunnel.
# RAYTPU_TEST_TPU=1 opts OUT of the pin so the TPU-gated tests
# (test_mega_bit_identity, test_sky_sampler_contract_on_tpu) actually run
# on the chip: `RAYTPU_TEST_TPU=1 pytest tests/test_mega.py -k identity`.
if os.environ.get("RAYTPU_TEST_TPU", "") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_RESOURCES = "/root/reference/resources"


@pytest.fixture(scope="session")
def resources_dir():
    if not os.path.isdir(REFERENCE_RESOURCES):
        pytest.skip("reference resources not mounted")
    return REFERENCE_RESOURCES


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
