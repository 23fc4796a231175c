"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path)."""

import os

# JAX_PLATFORMS is ignored when the axon TPU plugin is present; the legacy
# JAX_PLATFORM_NAME does force the CPU backend.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    # per-test deterministic stream: order-independent and run-stable
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.name.encode()))
