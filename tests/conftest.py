"""Test environment: force CPU with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh) and enable x64 for parity-grade numerics.

Must run before jax initializes a backend, hence the env vars at import time.
"""

import os

# Force CPU even when the session presets a TPU platform (JAX_PLATFORMS=axon):
# tests need x64 parity numerics and the 8-device virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compilation cache in tests: it only serves the TPU
# remote-compile workflow, and its executable-serialization write path
# segfaulted the suite process intermittently (observed 3x on 2026-08-19,
# faulthandler trace through compilation_cache.put_executable_and_time
# during the sharded all-gather compile). Empty string disables it
# (simpleicp_tpu/__init__.py honors SIMPLEICP_TPU_CACHE).
os.environ["SIMPLEICP_TPU_CACHE"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by the interpreter's sitecustomize (TPU plugin
# registration), so the env var alone is not enough — update the live config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA_DIR = "/root/reference/data"


def _load(name):
    from simpleicp_tpu.utils.xyz_io import read_xyz

    return read_xyz(os.path.join(DATA_DIR, name))


@pytest.fixture(scope="session")
def dragon():
    return _load("dragon1.xyz"), _load("dragon2.xyz")


@pytest.fixture(scope="session")
def bunny():
    return _load("bunny_part1.xyz"), _load("bunny_part2.xyz")


@pytest.fixture(scope="session")
def multisensor():
    return _load("multisensor_lidar.xyz"), _load("multisensor_radar.xyz")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
