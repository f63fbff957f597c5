"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter startup and pins
``JAX_PLATFORMS=axon`` (a remote TPU tunnel), so env vars set here are too
late — we must override through jax.config before any backend initializes.
Tests exercise multi-chip sharding on virtual CPU devices; only bench.py
uses the real TPU.
"""

import os
import sys

# XLA flags are read at backend creation (lazy), so this still takes effect.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        f"tests must run on CPU, got {jax.devices()}"
    )
