"""Device-mesh helpers.

The reference's parallelism is one OS thread per audio stream
(simulator.zig:221-232); here streams are a batch dimension sharded over a
``jax.sharding.Mesh``.  For VAD inference the mesh is 1-D ("data"); training
uses a 2-D ("data", "model") mesh (see ``train/``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Initialize multi-host JAX when launched under a cluster coordinator.

    Multi-host pods (BASELINE config 5: season corpus over a v5e slice) need
    ``jax.distributed.initialize`` before any backend use; hosts then see the
    global device set and the data mesh spans ICI+DCN. Controlled by the
    standard env vars (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID) or
    the auto-detecting TPU environment. Returns True if initialized.
    """
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["NUM_PROCESSES"]),
            process_id=int(os.environ["PROCESS_ID"]),
        )
        return True
    return False


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), ("data",))


def data_model_mesh(
    n_model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by model axis {n_model}")
    arr = np.array(devs).reshape(n // n_model, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (stream/batch) axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch(n: int, mesh: Mesh) -> int:
    """Round a batch size up to a multiple of the data-axis size."""
    d = mesh.shape["data"]
    return ((n + d - 1) // d) * d
