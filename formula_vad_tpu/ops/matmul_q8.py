"""Int8 matmul with the dequant fused into the kernel epilogue (Pallas).

Measured mechanism (benchmarks/int8_dot_probe.py, one v5e chip): the bare
int8 x int8 -> int32 contraction runs 1.72x FASTER than bf16 at the GRU's
fused-projection shape ([R, 400] @ [400, 1200], 15.05 vs 8.73 TFLOP/s) —
the int8 MXU rate is real — but XLA lowers the following
``.astype(f32) * scale`` as a SECOND pass over the [R, 1200] int32 result
through HBM, erasing the entire win (522.7 -> 1036.4 us). This kernel
keeps the int32 accumulator in VMEM and writes the scaled float result
directly: one HBM read of the int8 operands, one HBM write of the float
output, nothing else.

Used by the int8 serving tier's scan step (models/nsnet2_q8.py) when
Pallas is available; the XLA dot path remains the fallback (and the CPU
test path runs this kernel in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256


def _kernel(a_ref, b_ref, s_ref, out_ref):
    acc = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (acc.astype(jnp.float32) * s_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def matmul_q8(a8, b8, scale, out_dtype=jnp.float32, interpret: bool = False):
    """(a8 [R, K] int8) @ (b8 [K, N] int8) -> [R, N] ``out_dtype``, scaled.

    scale: [1, N] float32 — the combined dequant factor (s_a * s_b per
    output column; fold any static activation scale in before calling).
    R must be a multiple of TILE_R=256 — pad rows with zeros (int8 zero
    rows contribute exact zeros) and slice the result, or batch-shape the
    caller so R is aligned (the serving tick's row counts are multiples
    of 256 by construction). K and N need no alignment: Mosaic pads
    sublanes/lanes internally and int8 zero-padding is exact.
    """
    r, k = a8.shape
    k2, n = b8.shape
    assert k == k2 and scale.shape == (1, n), (a8.shape, b8.shape, scale.shape)
    if r % TILE_R:
        raise ValueError(f"rows {r} must be a multiple of {TILE_R} (pad with zeros)")
    return pl.pallas_call(
        _kernel,
        grid=(r // TILE_R,),
        in_specs=[
            pl.BlockSpec((TILE_R, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, n), out_dtype),
        interpret=interpret,
    )(a8, b8, scale)
