"""On-chip experiment: fused Pallas kernel for the NSNet2 GRU-stack recurrence.

ROOFLINE.md §3 names the GRU recurrence the largest remaining pipeline item
(~5.5 ms of 14.4 at bf16): the XLA lax.scan round-trips ~21 MB of carries +
per-step projections through HBM every one of the 54 steps (~1.1 GB/call)
and runs the gate elementwise on the VPU between MXU bursts.

The earlier time-grid kernel (models/nsnet2_pallas.py) measured 3x SLOWER
than the scan at 1680 rows. Hypothesis tested here: its gate slices
``gi[:, :400] / [400:800] / [800:]`` are lane-UNALIGNED (400 is not a
multiple of the 128-lane register width), so every step pays Mosaic lane
rotations across the whole [TILE, 1200] block. This experiment feeds the
kernel per-gate operands (z | r | n as separate arrays / weight slabs) so
no unaligned lane slicing exists anywhere, keeps h1/h2 in VMEM scratch
across the time grid, and fuses the gate math into the matmul epilogue.

Variants:
  V0   — production lax.scan (nsnet2.apply semantics, ff on all frames).
  VK   — fused per-gate kernel, f32 operands (matmul precision = ambient).
  VKb  — VK with bf16 weight/input-projection operands (half the DMA bytes,
         f32 accumulation + f32 gate math; a coarser rung than 'default').

Run on the real chip. Numbers comparable within one run only.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.models.nsnet2 import _dense
from formula_vad_tpu.ops.precision import matmul_precision

B = int(os.environ.get("BENCH_STREAMS", "21"))
K = int(os.environ.get("BENCH_CHUNKS", "40"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
N = B * 2 * K
T = 54
H = nsnet2.HIDDEN
ROW_TILE = int(os.environ.get("BENCH_ROW_TILE", "256"))
INTERPRET = os.environ.get("BENCH_INTERPRET", "") == "1"


def _kernel(
    giz_ref,  # [1, TILE, H] layer-1 z-gate input proj (incl. bi1_z + bh1_z)
    gir_ref,  # [1, TILE, H] .. r-gate (incl. bi1_r + bh1_r)
    gin_ref,  # [1, TILE, H] .. n-gate (incl. bi1_n only)
    w_ref,    # [9, H, H]: wh1_z wh1_r wh1_n wi2_z wi2_r wi2_n wh2_z wh2_r wh2_n
    b_ref,    # [8, H]: bh1_n b2_z b2_r bi2_n bh2_n pad pad pad
    out_ref,  # [1, TILE, H] layer-2 hidden at step t
    h1,       # VMEM scratch [TILE, H] f32
    h2,       # VMEM scratch [TILE, H] f32
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h1[:, :] = jnp.zeros_like(h1)
        h2[:, :] = jnp.zeros_like(h2)

    # bf16 operands must run at DEFAULT precision (Mosaic rejects a
    # multi-pass HIGHEST contract on bf16 inputs: 'Bad lhs/rhs type').
    prec = (jax.lax.Precision.DEFAULT if w_ref.dtype == jnp.bfloat16
            else matmul_precision())

    def dot(a, k):
        return jax.lax.dot_general(
            a,
            w_ref[k],
            (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )

    h1v = h1[:, :]
    h1w = h1v.astype(w_ref.dtype)  # Mosaic rejects mixed f32xbf16 dots
    m1 = jnp.float32(1.0)
    z1 = jax.nn.sigmoid(giz_ref[0] + dot(h1w, 0))
    r1 = jax.nn.sigmoid(gir_ref[0] + dot(h1w, 1))
    n1 = jnp.tanh(gin_ref[0] + r1 * (dot(h1w, 2) + b_ref[0]))
    h1n = (m1 - z1) * n1 + z1 * h1v
    h1[:, :] = h1n

    h2v = h2[:, :]
    h1d = h1n.astype(w_ref.dtype)
    z2 = jax.nn.sigmoid(dot(h1d, 3) + dot(h2v.astype(w_ref.dtype), 6) + b_ref[1])
    r2 = jax.nn.sigmoid(dot(h1d, 4) + dot(h2v.astype(w_ref.dtype), 7) + b_ref[2])
    n2 = jnp.tanh(
        (dot(h1d, 5) + b_ref[3]) + r2 * (dot(h2v.astype(w_ref.dtype), 8) + b_ref[4])
    )
    h2n = (m1 - z2) * n2 + z2 * h2v
    h2[:, :] = h2n
    out_ref[0, :, :] = h2n


def gru_stack_kernel(params, gi_z, gi_r, gi_n, dtype=jnp.float32):
    """gi_*: [N, T, H] per-gate layer-1 input projections (biases folded:
    z/r include bh1; n includes bi1_n only). Returns h2 sequence [N, T, H]."""
    g1, g2 = params.gru1, params.gru2
    n, t, _ = gi_z.shape
    n_pad = ((n + ROW_TILE - 1) // ROW_TILE) * ROW_TILE

    def prep(a):
        if n_pad != n:
            a = jnp.pad(a, ((0, n_pad - n), (0, 0), (0, 0)))
        return jnp.swapaxes(a, 0, 1).astype(dtype)  # [T, N, H] time-major

    gi_z, gi_r, gi_n = prep(gi_z), prep(gi_r), prep(gi_n)

    def slab(w):  # [H, 3H] -> 3 x [H, H] (z | r | n)
        return [w[:, :H], w[:, H : 2 * H], w[:, 2 * H :]]

    w9 = jnp.stack(
        slab(g1.wh) + slab(g2.wi) + slab(g2.wh)
    ).astype(dtype)  # [9, H, H]
    bz2 = g2.bi[:H] + g2.bh[:H]
    br2 = g2.bi[H : 2 * H] + g2.bh[H : 2 * H]
    b8 = jnp.stack(
        [
            g1.bh[2 * H :],  # bh1_n
            bz2,
            br2,
            g2.bi[2 * H :],  # bi2_n
            g2.bh[2 * H :],  # bh2_n
            jnp.zeros((H,), jnp.float32),
            jnp.zeros((H,), jnp.float32),
            jnp.zeros((H,), jnp.float32),
        ]
    )  # [8, H] f32

    row_spec = pl.BlockSpec(
        (1, ROW_TILE, H), lambda i, tt: (tt, i, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, tt: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // ROW_TILE, t),
        in_specs=[row_spec, row_spec, row_spec, const((9, H, H)), const((8, H))],
        out_specs=pl.BlockSpec(
            (1, ROW_TILE, H), lambda i, tt: (tt, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, n_pad, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROW_TILE, H), jnp.float32),
            pltpu.VMEM((ROW_TILE, H), jnp.float32),
        ],
        interpret=INTERPRET,
    )(gi_z, gi_r, gi_n, w9, b8)
    return jnp.swapaxes(out, 0, 1)[:n]


PAD_H = 512  # per-gate column slab, lane-aligned (H=400 padded to 4 vregs)
H2_OFF = 448  # h2's column offset inside the fused [TILE, 896] state scratch


def _kernel_p(
    giz_ref,  # [1, TILE, H] (incl. bi1_z + bh1_z)
    gir_ref,
    gin_ref,  # (incl. bi1_n only)
    wp1_ref,  # [H, 3*PAD_H]: wh1 per-gate slabs at aligned offsets
    wp2_ref,  # [896, 4*PAD_H]: rows 0:400 = wi2 (z|r|n_i|0), rows 448:848 =
    #           wh2 (z|r|0|n_h) — one dot yields all four layer-2 projections
    b_ref,    # [8, H]: bh1_n b2_z b2_r bi2_n bh2_n pad pad pad
    out_ref,  # [1, TILE, H]
    hcat,     # VMEM scratch [TILE, 896] f32: h1 at 0:400, h2 at 448:848
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hcat[:, :] = jnp.zeros_like(hcat)

    # bf16 operands must run at DEFAULT precision (Mosaic rejects a
    # multi-pass HIGHEST contract on bf16 inputs: 'Bad lhs/rhs type').
    prec = (jax.lax.Precision.DEFAULT if wp1_ref.dtype == jnp.bfloat16
            else matmul_precision())

    def dot(a, w):
        return jax.lax.dot_general(
            a,
            w,
            (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )

    m1 = jnp.float32(1.0)
    h1v = hcat[:, :H]
    g1 = dot(h1v.astype(wp1_ref.dtype), wp1_ref[:, :])  # [TILE, 3*PAD_H]
    z1 = jax.nn.sigmoid(giz_ref[0] + g1[:, :H])
    r1 = jax.nn.sigmoid(gir_ref[0] + g1[:, PAD_H : PAD_H + H])
    n1 = jnp.tanh(gin_ref[0] + r1 * (g1[:, 2 * PAD_H : 2 * PAD_H + H] + b_ref[0]))
    h1n = (m1 - z1) * n1 + z1 * h1v
    hcat[:, :H] = h1n

    h2v = hcat[:, H2_OFF : H2_OFF + H]
    g2 = dot(hcat[:, :].astype(wp2_ref.dtype), wp2_ref[:, :])  # [TILE, 4*PAD_H]
    z2 = jax.nn.sigmoid(g2[:, :H] + b_ref[1])
    r2 = jax.nn.sigmoid(g2[:, PAD_H : PAD_H + H] + b_ref[2])
    n2 = jnp.tanh(
        (g2[:, 2 * PAD_H : 2 * PAD_H + H] + b_ref[3])
        + r2 * (g2[:, 3 * PAD_H : 3 * PAD_H + H] + b_ref[4])
    )
    h2n = (m1 - z2) * n2 + z2 * h2v
    hcat[:, H2_OFF : H2_OFF + H] = h2n
    out_ref[0, :, :] = h2n


def gru_stack_kernel_p(params, gi_z, gi_r, gi_n, dtype=jnp.float32):
    """Combined-padded-weights variant: 2 dots/step, all slices lane-aligned.

    BUG NOTE (matters for correctness): wp2's dot consumes hcat AFTER h1 was
    updated — so g2's wi2 contribution uses h1[t] (correct: layer 2 consumes
    layer 1's current output) and the wh2 contribution uses h2[t-1] (correct:
    hcat's h2 block is updated after the dot). Matches the scan semantics.
    """
    g1, g2 = params.gru1, params.gru2
    n, t, _ = gi_z.shape
    n_pad = ((n + ROW_TILE - 1) // ROW_TILE) * ROW_TILE

    def prep(a):
        if n_pad != n:
            a = jnp.pad(a, ((0, n_pad - n), (0, 0), (0, 0)))
        return jnp.swapaxes(a, 0, 1)  # keep f32: gi adds run in f32

    gi_z, gi_r, gi_n = prep(gi_z), prep(gi_r), prep(gi_n)

    def pad_slab(w):  # [H, H] -> [H, PAD_H]
        return jnp.pad(w, ((0, 0), (0, PAD_H - H)))

    wp1 = jnp.concatenate(
        [pad_slab(g1.wh[:, :H]), pad_slab(g1.wh[:, H : 2 * H]), pad_slab(g1.wh[:, 2 * H :])],
        axis=1,
    ).astype(dtype)  # [H, 3*PAD_H]

    z = jnp.zeros((H, PAD_H), jnp.float32)
    top = jnp.concatenate(  # rows = h1 (wi2): z | r | n_i | 0
        [pad_slab(g2.wi[:, :H]), pad_slab(g2.wi[:, H : 2 * H]), pad_slab(g2.wi[:, 2 * H :]), z],
        axis=1,
    )
    bot = jnp.concatenate(  # rows = h2 (wh2): z | r | 0 | n_h
        [pad_slab(g2.wh[:, :H]), pad_slab(g2.wh[:, H : 2 * H]), z, pad_slab(g2.wh[:, 2 * H :])],
        axis=1,
    )
    wp2 = jnp.concatenate(
        [top, jnp.zeros((H2_OFF - H, 4 * PAD_H), jnp.float32), bot,
         jnp.zeros((896 - H2_OFF - H, 4 * PAD_H), jnp.float32)],
        axis=0,
    ).astype(dtype)  # [896, 4*PAD_H]

    bz2 = g2.bi[:H] + g2.bh[:H]
    br2 = g2.bi[H : 2 * H] + g2.bh[H : 2 * H]
    b8 = jnp.stack(
        [g1.bh[2 * H :], bz2, br2, g2.bi[2 * H :], g2.bh[2 * H :]]
        + [jnp.zeros((H,), jnp.float32)] * 3
    )

    row_spec = pl.BlockSpec(
        (1, ROW_TILE, H), lambda i, tt: (tt, i, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, tt: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel_p,
        grid=(n_pad // ROW_TILE, t),
        in_specs=[
            row_spec,
            row_spec,
            row_spec,
            const((H, 3 * PAD_H)),
            const((896, 4 * PAD_H)),
            const((8, H)),
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_TILE, H), lambda i, tt: (tt, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, n_pad, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROW_TILE, 896), jnp.float32)],
        interpret=INTERPRET,
    )(gi_z, gi_r, gi_n, wp1, wp2, b8)
    return jnp.swapaxes(out, 0, 1)[:n]


HP = 512  # manual-DMA lane pad: Mosaic requires HBM memref slices to be
          # 128-lane aligned ("Slice shape along dimension 4 must be
          # aligned to tiling (128), but is 400" on chip), so the
          # DMA'd arrays carry H=400 padded to 512 lanes (+28% DMA bytes
          # — part of this design's measured cost)


def _kernel_f(
    gi_hbm,   # [R, T, 3, TILE, HP] per-gate layer-1 projections, HBM-resident
    w_ref,    # [9, H, H] VMEM (dtype): wh1_z..n  wi2_z..n  wh2_z..n
    b_ref,    # [8, H] VMEM f32: bh1_n b2_z b2_r bi2_n bh2_n pad pad pad
    out_hbm,  # [R, T, TILE, HP] HBM-resident h2 sequence (out dtype)
    h1,       # VMEM scratch [TILE, H] f32 — RESIDENT across all T steps
    h2,       # VMEM scratch [TILE, H] f32
    gi_st,    # VMEM staging [2, 3, TILE, HP] (dtype) — double-buffered gi
    out_st,   # VMEM staging [2, TILE, HP] (out dtype) — double-buffered out
    sem_gi,   # DMA semaphores (2,)
    sem_out,  # DMA semaphores (2,)
):
    """Full-residency GRU-stack recurrence (VERDICT r4 next-#5): ONE kernel
    runs all T=54 steps with h1/h2 never leaving VMEM; per-step gi operands
    are DMA'd HBM->VMEM double-buffered (prefetch t+1 during step t's
    MXU/VPU work), per-step h2 DMA'd back VMEM->HBM double-buffered. No
    per-step HBM round-trip for the carries and no per-step kernel launch
    — the two costs the lax.scan schedule pays 54 times."""
    r = pl.program_id(0)
    T_ = gi_hbm.shape[1]

    def gi_dma(slot, t):
        return pltpu.make_async_copy(
            gi_hbm.at[r, t], gi_st.at[slot], sem_gi.at[slot]
        )

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            out_st.at[slot], out_hbm.at[r, t], sem_out.at[slot]
        )

    h1[:, :] = jnp.zeros_like(h1)
    h2[:, :] = jnp.zeros_like(h2)
    gi_dma(0, 0).start()

    # bf16 operands must run at DEFAULT precision (Mosaic rejects a
    # multi-pass HIGHEST contract on bf16 inputs: 'Bad lhs/rhs type').
    prec = (jax.lax.Precision.DEFAULT if w_ref.dtype == jnp.bfloat16
            else matmul_precision())

    def dot(a, k):
        return jax.lax.dot_general(
            a, w_ref[k], (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )

    def step(t, _):
        slot = jax.lax.rem(t, 2)
        nslot = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < T_)
        def _():
            gi_dma(nslot, t + 1).start()

        gi_dma(slot, t).wait()

        m1 = jnp.float32(1.0)
        h1v = h1[:, :]
        z1 = jax.nn.sigmoid(gi_st[slot, 0, :, :H].astype(jnp.float32) + dot(h1v.astype(w_ref.dtype), 0))
        r1 = jax.nn.sigmoid(gi_st[slot, 1, :, :H].astype(jnp.float32) + dot(h1v.astype(w_ref.dtype), 1))
        n1 = jnp.tanh(
            gi_st[slot, 2, :, :H].astype(jnp.float32)
            + r1 * (dot(h1v.astype(w_ref.dtype), 2) + b_ref[0])
        )
        h1n = (m1 - z1) * n1 + z1 * h1v
        h1[:, :] = h1n

        h2v = h2[:, :]
        h1d = h1n.astype(w_ref.dtype)
        h2d = h2v.astype(w_ref.dtype)
        z2 = jax.nn.sigmoid(dot(h1d, 3) + dot(h2d, 6) + b_ref[1])
        r2 = jax.nn.sigmoid(dot(h1d, 4) + dot(h2d, 7) + b_ref[2])
        n2 = jnp.tanh((dot(h1d, 5) + b_ref[3]) + r2 * (dot(h2d, 8) + b_ref[4]))
        h2n = (m1 - z2) * n2 + z2 * h2v
        h2[:, :] = h2n

        # Reuse of this out slot: its previous DMA (step t-2) must land
        # before we overwrite the staging buffer.
        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()

        out_st[slot, :, :H] = h2n.astype(out_st.dtype)
        out_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, T_, step, 0)
    # Drain the in-flight output DMAs before the program ends. T_ is a
    # static shape, so plain-Python guards suffice; without them a T_<2
    # sequence would wait on never-started copies at negative indices
    # (caught in review; the bench shape is T=54 but the launcher accepts
    # any [N, T, H]).
    if T_ >= 2:
        out_dma((T_ - 2) % 2, T_ - 2).wait()
    if T_ >= 1:
        out_dma((T_ - 1) % 2, T_ - 1).wait()


def gru_stack_kernel_f(params, gi_z, gi_r, gi_n, dtype=jnp.float32,
                       tile=None, out_dtype=None):
    """Full-residency launcher: [N, T, H] per-gate projections -> [N, T, H]
    h2 sequence. tile = rows per program (defaults to all rows, padded to
    the f32 sublane multiple); out_dtype defaults to dtype."""
    out_dtype = out_dtype or dtype
    g1, g2 = params.gru1, params.gru2
    n, t, _ = gi_z.shape
    tile = tile or ((n + 7) // 8 * 8)
    n_pad = ((n + tile - 1) // tile) * tile
    n_r = n_pad // tile

    def prep(a):
        a = jnp.pad(a, ((0, n_pad - n), (0, 0), (0, HP - H)))
        # [N, T, HP] -> [R, T, TILE, HP] row-tiled, time-major inside a tile
        return (
            a.reshape(n_r, tile, t, HP).swapaxes(1, 2).astype(dtype)
        )

    gi = jnp.stack([prep(gi_z), prep(gi_r), prep(gi_n)], axis=2)  # [R,T,3,TILE,H]

    def slab(w):
        return [w[:, :H], w[:, H : 2 * H], w[:, 2 * H :]]

    w9 = jnp.stack(slab(g1.wh) + slab(g2.wi) + slab(g2.wh)).astype(dtype)
    bz2 = g2.bi[:H] + g2.bh[:H]
    br2 = g2.bi[H : 2 * H] + g2.bh[H : 2 * H]
    b8 = jnp.stack(
        [g1.bh[2 * H :], bz2, br2, g2.bi[2 * H :], g2.bh[2 * H :]]
        + [jnp.zeros((H,), jnp.float32)] * 3
    )

    const = lambda shape: pl.BlockSpec(
        shape, lambda r: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel_f,
        grid=(n_r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # gi stays in HBM
            const((9, H, H)),
            const((8, H)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # manual out DMA
        out_shape=jax.ShapeDtypeStruct((n_r, t, tile, HP), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, H), jnp.float32),
            pltpu.VMEM((tile, H), jnp.float32),
            pltpu.VMEM((2, 3, tile, HP), dtype),
            pltpu.VMEM((2, tile, HP), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                os.environ.get("BENCH_VMEM_LIMIT", str(100 * 1024 * 1024))
            ),
        ),
        interpret=INTERPRET,
    )(gi, w9, b8)
    # [R, T, TILE, HP] -> [N, T, H]
    return (
        out.swapaxes(1, 2).reshape(n_pad, t, HP)[:n, :, :H].astype(jnp.float32)
    )


def apply_vf(params, features, dtype=jnp.float32, tile=None, out_dtype=None):
    gi_z, gi_r, gi_n = _gi_gates(params, features)
    y = gru_stack_kernel_f(
        params, gi_z, gi_r, gi_n, dtype=dtype, tile=tile, out_dtype=out_dtype
    )
    return _ff_head(params, y)


def _gi_gates(params, features):
    """Per-gate layer-1 input projections with step-invariant biases folded:
    z/r gates see gi + gh = x@wi + bi + h@wh + bh -> fold bi+bh here; the
    n gate's bh1_n sits inside the r1*(..) product, so only bi1_n folds."""
    g1 = params.gru1
    x = _dense(features, params.fc_in_w, params.fc_in_b)
    gi1 = jnp.matmul(x, g1.wi, precision=matmul_precision())
    gi_z = gi1[..., :H] + (g1.bi[:H] + g1.bh[:H])
    gi_r = gi1[..., H : 2 * H] + (g1.bi[H : 2 * H] + g1.bh[H : 2 * H])
    gi_n = gi1[..., 2 * H :] + g1.bi[2 * H :]
    return gi_z, gi_r, gi_n


def _ff_head(params, y):
    y = jax.nn.relu(_dense(y, params.ff1_w, params.ff1_b))
    y = jax.nn.relu(_dense(y, params.ff2_w, params.ff2_b))
    return jax.nn.sigmoid(_dense(y, params.out_w, params.out_b))


def apply_vk(params, features, dtype=jnp.float32):
    gi_z, gi_r, gi_n = _gi_gates(params, features)
    y = gru_stack_kernel(params, gi_z, gi_r, gi_n, dtype=dtype)
    return _ff_head(params, y)


def apply_vkp(params, features, dtype=jnp.float32):
    gi_z, gi_r, gi_n = _gi_gates(params, features)
    y = gru_stack_kernel_p(params, gi_z, gi_r, gi_n, dtype=dtype)
    return _ff_head(params, y)


def apply_v0(params, features):
    return nsnet2.apply(params, features)


def timed(name, fn, inputs, ref=None):
    out = fn(inputs[0])
    float(jnp.max(jnp.abs(out)))  # real sync (block_until_ready is a relay no-op)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for i in range(n):
            o = fn(inputs[i % len(inputs)])
        float(jnp.max(jnp.abs(o)))
        return time.perf_counter() - t0

    n_long = max(4, ITERS)
    n_short = max(2, n_long // 4)
    dt = (run(n_long) - run(n_short)) / (n_long - n_short)
    diff = ""
    if ref is not None:
        diff = f"  max|diff| vs V0 = {float(jnp.max(jnp.abs(out - ref))):.3e}"
    print(f"{name:28s} {dt*1e3:8.2f} ms{diff}", flush=True)
    return out, dt


def main():
    params = nsnet2.load(None)
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((N, T, 161)) - 6.0, jnp.float32)
        for _ in range(2)
    ]
    ref, _ = timed("V0 lax.scan", jax.jit(lambda f: apply_v0(params, f)), feats)
    variants = os.environ.get("BENCH_VARIANTS", "vk,vkb").split(",")
    table = {
        "vk": (f"VK fused tile={ROW_TILE}", lambda f: apply_vk(params, f)),
        "vkb": (
            f"VKb bf16-dma tile={ROW_TILE}",
            lambda f: apply_vk(params, f, dtype=jnp.bfloat16),
        ),
        "vkp": (f"VKp 2-dot tile={ROW_TILE}", lambda f: apply_vkp(params, f)),
        "vkpb": (
            f"VKpb 2-dot bf16 tile={ROW_TILE}",
            lambda f: apply_vkp(params, f, dtype=jnp.bfloat16),
        ),
        # Full-residency manual-DMA variants (VERDICT r4 next-#5): h in
        # VMEM across all 54 steps, gi prefetched, no per-step launches.
        "vf": (
            "VF full-res f32 (whole batch)",
            lambda f: apply_vf(params, f),
        ),
        "vfb": (
            "VFb full-res bf16 (whole batch)",
            lambda f: apply_vf(params, f, dtype=jnp.bfloat16),
        ),
        "vfb840": (
            "VFb full-res bf16 tile=840",
            lambda f: apply_vf(params, f, dtype=jnp.bfloat16, tile=840),
        ),
        "vfb416": (
            # tile must be a sublane multiple (Mosaic: "Slice shape along
            # dimension 3 must be aligned to tiling (8), but is 420").
            "VFb full-res bf16 tile=416",
            lambda f: apply_vf(params, f, dtype=jnp.bfloat16, tile=416),
        ),
    }
    for v in variants:
        name, fn = table[v.strip()]
        timed(name, jax.jit(fn), feats, ref)


if __name__ == "__main__":
    main()
