"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver validates real-TPU behavior separately via bench.py and
__graft_entry__.dryrun_multichip)."""

import os

# Must be set before jax is imported anywhere in the test process.  Forced
# (not setdefault): the surrounding environment may pin an experimental TPU
# platform, but the unit suite is defined to run on the virtual 8-device CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize imports jax at interpreter start to register
# an experimental TPU platform, which freezes jax's env-derived config before
# this file runs — so the env var alone is not enough; update the live config
# (safe because no backend has been initialized yet at collection time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
