"""Checkpoint / resume for streaming state and training.

The reference has NO checkpointing: all state (ring buffers, rolling
averages, FSM, denoiser context) is in-memory and lost on exit
(SURVEY.md §5).  Because this framework's streaming state is an explicit
carry pytree, checkpointing is trivial — and a daemon restart can resume
mid-stream with bit-identical downstream behavior.

* ``save_carry`` / ``load_carry`` — any carry pytree (VAD chunk carry, FSM
  carry, GRU state) to/from a single ``.npz``.
* ``save_train_state`` / ``load_train_state`` — NSNet2 params + optax
  state via orbax when available, npz otherwise.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_carry(path: str, carry: Any) -> None:
    """Serialize a carry pytree to .npz (structure captured via treedef)."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_carry(path: str, template: Any) -> Any:
    """Restore a carry saved by ``save_carry`` into ``template``'s structure.

    The template (e.g. a fresh ``vad.init_carry(st)``) supplies the treedef;
    leaf count and shapes must match.
    """
    z = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    n = len(leaves)
    loaded = [z[f"leaf_{i}"] for i in range(n)]
    for i, (a, b) in enumerate(zip(loaded, leaves)):
        if a.shape != np.shape(b):
            raise ValueError(
                f"carry leaf {i} shape mismatch: checkpoint {a.shape} vs template {np.shape(b)}"
            )
    # Numpy template leaves stay numpy (jnp.asarray would truncate int64
    # counters under x64-disabled JAX); jax leaves go back to device.
    restored = [
        a if isinstance(t, (np.ndarray, np.generic)) else jnp.asarray(a)
        for a, t in zip(loaded, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)


def save_train_state(directory: str, params: Any, opt_state: Any, step: int) -> None:
    """Checkpoint training state; orbax if importable, npz fallback."""
    os.makedirs(directory, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.join(os.path.abspath(directory), f"step_{step}"),
            {"params": params, "opt_state": opt_state},
            force=True,
        )
        ckptr.wait_until_finished()
    except (ImportError, Exception):  # noqa: BLE001 — orbax config varies; npz always works
        save_carry(os.path.join(directory, f"step_{step}_params.npz"), params)
        save_carry(os.path.join(directory, f"step_{step}_opt.npz"), opt_state)
    with open(os.path.join(directory, "latest.json"), "w") as f:
        json.dump({"step": step}, f)


def latest_step(directory: str) -> int | None:
    path = os.path.join(directory, "latest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)["step"]


def load_train_state(directory: str, params_template: Any, opt_template: Any, step: int):
    orbax_path = os.path.join(os.path.abspath(directory), f"step_{step}")
    if os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            orbax_path, {"params": params_template, "opt_state": opt_template}
        )
        return restored["params"], restored["opt_state"]
    params = load_carry(os.path.join(directory, f"step_{step}_params.npz"), params_template)
    opt = load_carry(os.path.join(directory, f"step_{step}_opt.npz"), opt_template)
    return params, opt
