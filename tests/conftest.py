"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path).

IMPORTANT: pytest auto-loads plugins (jaxtyping, hypothesis, ...) that
import jax BEFORE this conftest runs, so setting env vars here is not
enough — the backend may already have initialized on the axon TPU plugin.
We force the config and clear any initialized backends, then assert.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
# JAX_PLATFORMS is ignored when the axon TPU plugin is present, but set it
# anyway for vanilla environments
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platform_name", "cpu")
try:  # reset any backend a plugin already initialized
    from jax.extend.backend import clear_backends
except Exception:  # pre-0.4.x spelling (removed from the jax namespace)
    clear_backends = getattr(jax, "clear_backends", lambda: None)
try:
    clear_backends()
except Exception:
    pass
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration tests")


@pytest.fixture()
def rng(request):
    # per-test deterministic stream: order-independent and run-stable
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.name.encode()))
