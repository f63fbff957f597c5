"""Pallas TPU kernel for the NSNet2 GRU stack recurrence.

The network's cost is dominated by the two stacked GRUs: per time step,
three [rows, 400] @ [400, 1200] matmuls (layer-1 recurrent, layer-2 input,
layer-2 recurrent) plus gate math — too small individually for XLA to keep
the MXU busy across the 54-step scan.

This kernel runs the recurrence with a grid of (row_tiles, time): the time
axis is minor, so for a fixed row tile the steps execute sequentially on
the core while Mosaic double-buffers the per-step input block; the GRU
hidden states live in VMEM scratch and the three weight matrices stay
resident (constant index_map) for the whole pass.

The surrounding pointwise stages (input Dense + layer-1 input projection
before; the FF head after) remain plain XLA matmuls over the whole
sequence — they are already MXU-shaped.

Gate order and linear_before_reset=1 semantics match ``nsnet2.gru_cell``;
``apply_pallas`` output is asserted equal to ``nsnet2.apply`` in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.precision import matmul_precision
from . import nsnet2

H = nsnet2.HIDDEN
ROW_TILE = 256


def _gru_gates(gi, gh):
    """z|r|n gate math, linear_before_reset=1 (matches nsnet2.gru_cell_pre)."""
    z = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
    r = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
    return z, n


def _kernel(
    gi1_ref,  # [1, TILE, 3H] layer-1 input projection at step t (time-major)
    wh1_ref,  # [H, 3H]
    bh1_ref,  # [1, 3H]
    wi2_ref,  # [H, 3H]
    bi2_ref,  # [1, 3H]
    wh2_ref,  # [H, 3H]
    bh2_ref,  # [1, 3H]
    out_ref,  # [1, TILE, H] layer-2 hidden at step t
    h1,  # VMEM scratch [TILE, H]
    h2,  # VMEM scratch [TILE, H]
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h1[:, :] = jnp.zeros_like(h1)
        h2[:, :] = jnp.zeros_like(h2)

    prec = matmul_precision()
    gi1 = gi1_ref[0, :, :]
    gh1 = (
        jnp.dot(h1[:, :], wh1_ref[:, :], precision=prec, preferred_element_type=jnp.float32)
        + bh1_ref[0, :]
    )
    z1, n1 = _gru_gates(gi1, gh1)
    new_h1 = (1.0 - z1) * n1 + z1 * h1[:, :]
    h1[:, :] = new_h1

    gi2 = (
        jnp.dot(new_h1, wi2_ref[:, :], precision=prec, preferred_element_type=jnp.float32)
        + bi2_ref[0, :]
    )
    gh2 = (
        jnp.dot(h2[:, :], wh2_ref[:, :], precision=prec, preferred_element_type=jnp.float32)
        + bh2_ref[0, :]
    )
    z2, n2 = _gru_gates(gi2, gh2)
    new_h2 = (1.0 - z2) * n2 + z2 * h2[:, :]
    h2[:, :] = new_h2
    out_ref[0, :, :] = new_h2


def gru_stack_pallas(
    params: nsnet2.NSNet2Params, gi1_seq: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Run both GRU layers over a sequence of precomputed layer-1 input
    projections.

    Args:
      gi1_seq: [N, T, 3H] = x @ wi1 + bi1 for the whole sequence.
    Returns:
      h2 sequence [N, T, H].
    """
    if not (params.gru1.linear_before_reset and params.gru2.linear_before_reset):
        # The kernel's gate math hardcodes linear_before_reset=1 (PyTorch
        # exports); lbr=0 models must use the XLA path (nsnet2.apply).
        raise NotImplementedError(
            "gru_stack_pallas supports linear_before_reset=1 GRUs only"
        )
    n, t, _ = gi1_seq.shape
    n_pad = ((n + ROW_TILE - 1) // ROW_TILE) * ROW_TILE
    if n_pad != n:
        gi1_seq = jnp.pad(gi1_seq, ((0, n_pad - n), (0, 0), (0, 0)))
    # Time-major layout: blocks must have (rows, features) as trailing dims.
    gi1_seq = jnp.swapaxes(gi1_seq, 0, 1)  # [T, N, 3H]

    def w2(x):  # biases as [1, 3H] rows for SMEM-free VMEM residence
        return jnp.asarray(x).reshape(1, -1)

    row_spec = pl.BlockSpec(
        (1, ROW_TILE, 3 * H), lambda i, tt: (tt, i, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i, tt: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, ROW_TILE, H), lambda i, tt: (tt, i, 0), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // ROW_TILE, t),
        in_specs=[
            row_spec,
            const((H, 3 * H)),
            const((1, 3 * H)),
            const((H, 3 * H)),
            const((1, 3 * H)),
            const((H, 3 * H)),
            const((1, 3 * H)),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((t, n_pad, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROW_TILE, H), jnp.float32),
            pltpu.VMEM((ROW_TILE, H), jnp.float32),
        ],
        interpret=interpret,
    )(
        gi1_seq,
        params.gru1.wh,
        w2(params.gru1.bh),
        params.gru2.wi,
        w2(params.gru2.bi),
        params.gru2.wh,
        w2(params.gru2.bh),
    )
    return jnp.swapaxes(out, 0, 1)[:n]


def apply_pallas(
    params: nsnet2.NSNet2Params, features: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for ``nsnet2.apply`` with the recurrence as a Pallas kernel.

    features: [N, T, 161] -> gains [N, T, 161]. (2-D leading batch only;
    reshape higher-rank batches before calling.)
    """
    assert features.ndim == 3
    x = jnp.matmul(features, params.fc_in_w, precision=matmul_precision()) + params.fc_in_b
    gi1 = jnp.matmul(x, params.gru1.wi, precision=matmul_precision()) + params.gru1.bi
    y = gru_stack_pallas(params, gi1, interpret=interpret)
    y = jax.nn.relu(jnp.matmul(y, params.ff1_w, precision=matmul_precision()) + params.ff1_b)
    y = jax.nn.relu(jnp.matmul(y, params.ff2_w, precision=matmul_precision()) + params.ff2_b)
    return jax.nn.sigmoid(
        jnp.matmul(y, params.out_w, precision=matmul_precision()) + params.out_b
    )
