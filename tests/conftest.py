"""Test harness: run the suite on a virtual 8-device CPU mesh.

Multi-chip logic (TP/PP/EP shardings) is exercised on 8 virtual CPU
devices, mirroring the test strategy SURVEY.md §4 recommends over the
reference's real-NCCL-only launchers. The container's sitecustomize
registers the axon TPU plugin before test code runs, but JAX backends
initialize lazily — flipping `jax_platforms` here (before any device use)
selects the CPU backend. Set CHITU_TPU_TEST_BACKEND=tpu to run the suite on
the real chip instead.
"""

import os

_backend = os.environ.get("CHITU_TPU_TEST_BACKEND", "cpu")
if _backend == "cpu":
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 "
        + os.environ.get("XLA_FLAGS", "")
    )

import jax  # noqa: E402

if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
