"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere — pytest imports conftest first.
Tests exercise multi-chip sharding on virtual CPU devices; the real TPU is
used only by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
