"""Test harness configuration.

Runs everything on CPU (fast iteration, no TPU-tunnel latency) with 8 virtual
devices so mesh/sharding tests exercise real multi-device SPMD — the TPU-native
replacement for testing multi-node paths without a cluster (SURVEY.md §4).
"""

import os

# Must be set before jax initializes its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU's in-process collectives abort the whole process (SIGABRT)
    # when the 8 virtual-device threads don't all reach a rendezvous
    # within a hard 40 s watchdog — which a single-core host's scheduler
    # intermittently violates under the scanned backbone's per-iteration
    # collectives (observed ~50% in the full quick-suite run). Raise the
    # watchdog: a genuine deadlock still aborts, just later.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags
# Pure-JAX MSDA on CPU (the Pallas kernel is tested explicitly in interpret mode).
os.environ.setdefault("DINOUNET_TPU_MSDA_IMPL", "jax")

import jax  # noqa: E402

# Route all test computation to CPU even when a TPU platform is registered.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
