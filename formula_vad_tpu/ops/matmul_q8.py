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

STATUS: measurement infrastructure, not a live model path. The kernel
WINS standalone (426 us bf16-out vs 1256 us bf16 at 24,064 rows) but no
int8 formulation survives the scan context (full-tick A/Bs: x0.33-0.91
vs float — ROOFLINE.md "Dead end: int8"), so the shipping int8 tier
(models/nsnet2_q8.py) uses its per-gate XLA form and never calls this in
auto mode. ``dot_q8`` remains for probes (benchmarks/int8_dot_probe.py)
and for forcing the kernel via FVAD_Q8_KERNEL=pallas; all backends are
bitwise-identical, so the knob can never change results.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256

# FVAD_Q8_KERNEL: auto (pallas on TPU when the row count merits it),
# pallas (force), xla (force the dot_general path). The two paths are
# BITWISE identical — int8 x int8 accumulates exactly in int32 and the
# epilogue is the same float multiply — so the knob is purely about speed.
_KERNEL_ENV = os.environ.get("FVAD_Q8_KERNEL", "auto").lower()
if _KERNEL_ENV not in ("auto", "pallas", "xla"):
    raise ValueError(
        f"FVAD_Q8_KERNEL must be auto|pallas|xla, got {_KERNEL_ENV!r}"
    )


def _kernel(a_ref, b_ref, s_ref, out_ref):
    acc = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (acc.astype(jnp.float32) * s_ref[:]).astype(out_ref.dtype)


def _kernel_rs(a_ref, b_ref, s_ref, r_ref, out_ref):
    # Row-scaled variant: dynamic per-row activation scales join the
    # per-column weight scales in the same epilogue (still one HBM write).
    acc = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (acc.astype(jnp.float32) * s_ref[:] * r_ref[:]).astype(
        out_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def matmul_q8(
    a8, b8, scale, row_scale=None, out_dtype=jnp.float32, interpret: bool = False
):
    """(a8 [R, K] int8) @ (b8 [K, N] int8) -> [R, N] ``out_dtype``, scaled.

    scale: [1, N] float32 — the combined dequant factor (s_a * s_b per
    output column; fold any static activation scale in before calling).
    row_scale: optional [R, 1] float32 — dynamic per-row activation
    scales, applied in the same epilogue.
    R must be a multiple of TILE_R=256 — pad rows with zeros (int8 zero
    rows contribute exact zeros) and slice the result, or batch-shape the
    caller so R is aligned (the serving tick's row counts are multiples
    of 256 by construction). K and N need no alignment: Mosaic pads
    sublanes/lanes internally and int8 zero-padding is exact.
    """
    r, k = a8.shape
    k2, n = b8.shape
    if k != k2 or scale.shape != (1, n):
        raise ValueError(
            f"shape mismatch: a {a8.shape} @ b {b8.shape}, scale {scale.shape} "
            f"(want a [R, K] @ b [K, N] with scale [1, N])"
        )
    if r % TILE_R:
        raise ValueError(f"rows {r} must be a multiple of {TILE_R} (pad with zeros)")
    specs = [
        pl.BlockSpec((TILE_R, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = (a8, b8, scale)
    kernel = _kernel
    if row_scale is not None:
        if row_scale.shape != (r, 1):
            raise ValueError(f"row_scale shape {row_scale.shape} != ({r}, 1)")
        specs.append(
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args = (a8, b8, scale, row_scale)
        kernel = _kernel_rs
    return pl.pallas_call(
        kernel,
        grid=(r // TILE_R,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (TILE_R, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, n), out_dtype),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Flexible entry point: arbitrary leading dims, vmap-aware row collapsing
# ---------------------------------------------------------------------------
#
# The serving tick runs the quantized model INSIDE vmap(chunk_step): each
# per-stream call sees [C=2, 400] activations, and only vmap's batching
# makes the row count MXU-worthy (B*C rows). A fixed-tile Pallas kernel
# can't be batched that way automatically, so dot_q8 is a custom_vmap
# primitive whose batching rule COLLAPSES the mapped axis into rows — the
# op is row-parallel, so this is exact — before choosing a backend. The
# XLA fallback (small/unaligned row counts, non-TPU platforms) computes
# the identical int32 accumulation + float epilogue, so backend choice
# never changes results.


def _dot_q8_impl(a8, b8, scale, row, out_dtype, interpret):
    r, k = a8.shape
    plat = jax.devices()[0].platform
    # Backend selection, from the measured mechanism at the dense serving
    # row count (benchmarks/int8_dot_probe.py, 24064 rows, one process):
    # bf16 1256 us; bare int8 519; XLA preferred_element_type=f32 + scale
    # 553 (XLA fuses the epilogue when asked for FLOAT output directly);
    # int32-out + convert 1041 (the unfused second pass); Pallas kernel
    # 698 f32-out / 426 bf16-out. So auto routes bf16 outputs to the
    # Pallas kernel (f32 writes are 2x the bytes — XLA's fused f32 form
    # wins there) and float32 outputs to the XLA f32-preferred dot.
    use_pallas = _KERNEL_ENV == "pallas" or (
        _KERNEL_ENV == "auto"
        and (plat == "tpu" or interpret)
        and r >= TILE_R  # padding tiny row counts would waste the MXU
        and jnp.dtype(out_dtype) == jnp.bfloat16
    )
    if use_pallas and plat == "cpu" and not interpret:
        if _KERNEL_ENV == "pallas":
            raise ValueError(
                "FVAD_Q8_KERNEL=pallas forced, but the CPU backend has no "
                "Mosaic — pass interpret=True (tests) or run on TPU; "
                "silently taking the XLA path would fake a kernel validation"
            )
        use_pallas = False  # auto: Mosaic needs the TPU backend
    if use_pallas:
        pad = (-r) % TILE_R
        ap = jnp.pad(a8, ((0, pad), (0, 0))) if pad else a8  # int8 zeros: exact
        rp = None
        if row is not None:
            rp = jnp.pad(row, ((0, pad), (0, 0))) if pad else row
        out = matmul_q8(
            ap, b8, scale, row_scale=rp, out_dtype=out_dtype, interpret=interpret
        )
        return out[:r] if pad else out
    # f32 accumulation of int8 products is EXACT while |sum| < 2^24
    # (worst case k * 127^2) — for K <= 1040 the f32-preferred dot is
    # bitwise the int32 accumulation converted, and XLA keeps its dequant
    # fused. Larger K falls back to the exact int32 form.
    if k * 127 * 127 < 2**24:
        acc = jax.lax.dot_general(
            a8, b8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    else:
        acc = jax.lax.dot_general(
            a8, b8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    out = acc * scale
    if row is not None:
        out = out * row
    return out.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _dot_q8_for(out_dtype, interpret, has_row):
    if has_row:

        @jax.custom_batching.custom_vmap
        def fn(a8, b8, scale, row):
            return _dot_q8_impl(a8, b8, scale, row, out_dtype, interpret)

        @fn.def_vmap
        def _rule(axis_size, in_batched, a8, b8, scale, row):  # noqa: ANN001
            a_b, b_b, s_b, r_b = in_batched
            if b_b or s_b or not a_b or not r_b:
                raise NotImplementedError(
                    "dot_q8 batching expects activations (+row scales) "
                    "batched, weights shared"
                )
            bsz, r, k = a8.shape
            out = fn(a8.reshape(bsz * r, k), b8, scale, row.reshape(bsz * r, 1))
            return out.reshape(bsz, r, out.shape[-1]), True

        return fn

    @jax.custom_batching.custom_vmap
    def fn(a8, b8, scale):
        return _dot_q8_impl(a8, b8, scale, None, out_dtype, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, a8, b8, scale):  # noqa: ANN001
        a_b, b_b, s_b = in_batched
        if b_b or s_b or not a_b:
            # Weights/scales are shared across streams in every caller;
            # keep the rule simple and exact.
            raise NotImplementedError(
                "dot_q8 batching expects activations batched, weights shared"
            )
        bsz, r, k = a8.shape
        out = fn(a8.reshape(bsz * r, k), b8, scale)
        return out.reshape(bsz, r, out.shape[-1]), True

    return fn


def dot_q8(
    a8, b8, scale, row_scale=None, out_dtype=jnp.float32, interpret: bool = False
):
    """(a8 [..., K] int8) @ (b8 [K, N] int8) * scale [* row_scale] -> [..., N].

    Row-parallel quantized matmul with exact int32 accumulation.
    row_scale: optional [..., 1] dynamic per-row activation scales. Under
    ``vmap`` the mapped axes COLLAPSE into rows (custom_vmap rule), so the
    per-stream [C, K] calls inside the vmapped serving step reach the
    Pallas kernel as one [B*C, K] contraction. Backend (Pallas fused-
    dequant kernel vs XLA dot + epilogue) is chosen per FVAD_Q8_KERNEL and
    row count; both compute bitwise-identical results.
    """
    lead = a8.shape[:-1]
    fn = _dot_q8_for(jnp.dtype(out_dtype).name, interpret, row_scale is not None)
    flat = a8.reshape((-1, a8.shape[-1])) if len(lead) != 1 else a8
    if row_scale is None:
        out = fn(flat, b8, scale)
    else:
        rflat = row_scale.reshape((-1, 1)) if len(lead) != 1 else row_scale
        out = fn(flat, b8, scale, rflat)
    return out.reshape(lead + (b8.shape[1],))
