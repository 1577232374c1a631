"""Test configuration: run everything on a virtual 8-device CPU backend.

Must set the XLA flags before jax initializes a backend, so this executes at
conftest import time (pytest imports conftest before test modules).
"""

import os

# Force CPU: the outer environment may pin JAX_PLATFORMS=axon (the TPU
# tunnel); tests must run on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The test host has very few cores; persistently cache XLA compilations so
# repeated pytest runs don't pay the compile cost again.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU plugin in every
# interpreter and pins JAX_PLATFORMS=axon; the env var alone does not win.
# Force the CPU backend explicitly (must happen before any device use).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
