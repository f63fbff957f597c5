"""Pallas TPU kernel for the speech-FSM window scan.

The FSM is the only inherently sequential stage of the offline pipeline
(VADMachine.zig:176-178 couples the rolling-average update to the FSM
decision), so after the chunk-parallel rewrite it bounds the wall-clock:
as a ``lax.scan`` it executes ~1 tiny HLO loop iteration per 21 ms window.

This kernel runs the ENTIRE window scan inside Pallas programs with no
per-step dispatch:

* grid = (n_streams, n_tiles): the tile axis is minor, so for each stream
  the tiles execute sequentially on the core — the scan state survives
  across tiles in scratch (TPU scratch persists along the grid).
* per-window scalars (inputs and outputs) live in SMEM blocks — Mosaic
  cannot index single VMEM lanes dynamically, but SMEM is scalar memory.
* the three rolling-average ring buffers live in VMEM scratch; a ring push
  is a masked whole-buffer select and the average is a full VPU reduction,
  matching the reference's recompute-on-push semantics
  (RollingAverage.zig:45-56).
* FSM registers (state, indices, accumulators) persist in SMEM scratch.

Semantics are identical to ``fsm.step_window`` (asserted by tests, which
run the kernel in interpreter mode on CPU against the scan reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fsm

LANES = 128
TILE = 512  # windows per grid step (~10.9 s of audio)

# SMEM register file layout (int32 / float32 scratch arrays)
I_LONG_IDX, I_LONG_CNT, I_SHORT_IDX, I_SHORT_CNT, I_RATIO_IDX, I_RATIO_CNT, \
    I_STATE, I_START, I_END, I_SEG_CNT = range(10)
NI = 10
F_LONG_LAST, F_SEG_SUM, F_MET_SEC = range(3)
NF = 3


def _rows(n: int) -> int:
    return max(1, (n + LANES - 1) // LANES)


def _kernel(
    shape: fsm.FSMShape,
    # inputs (SMEM blocks [1, 1, TILE] except scalars [1, 1])
    minvol_ref,
    ratio_ref,
    valid_ref,
    tf_ref,
    rt_ref,
    mc_ref,
    mg_ref,
    md_ref,
    ia_ref,
    win_base_ref,  # [1, 1] i32: global index of this stream's first window
    # initial carry (per stream): ring buffers in VMEM, registers in SMEM
    long_in,  # [1, rows(L), 128] f32
    short_in,  # [1, rows(S), 128] f32
    ratio_in,  # [1, rows(R), 128] f32
    ireg_in,  # [1, NI] i32
    freg_in,  # [1, NF] f32
    # outputs (SMEM blocks [1, 1, TILE]) + final carry
    event_ref,
    eventwin_ref,
    segvalid_ref,
    segstart_ref,
    segend_ref,
    segratio_ref,
    segmet_ref,
    long_out,  # [1, rows(L), 128] f32
    short_out,
    ratio_out,
    ireg_out,  # [1, NI] i32
    freg_out,  # [1, NF] f32
    # scratch
    long_buf,  # VMEM [rows(L), 128] f32
    short_buf,  # VMEM [rows(S), 128] f32
    ratio_buf,  # VMEM [rows(R), 128] f32
    ireg,  # SMEM (NI,) i32
    freg,  # SMEM (NF,) f32
):
    L, S, R = shape.long_window, shape.short_window, shape.ratio_window
    fftsz = np.int32(shape.fft_size)
    win_sec = np.float32(shape.window_sec)
    sr = np.float32(shape.sample_rate)

    tf = tf_ref[0, 0, 0]
    rth = rt_ref[0, 0, 0]
    min_consec = mc_ref[0, 0, 0]
    max_gap = mg_ref[0, 0, 0]
    min_dur = md_ref[0, 0, 0]
    init_avg = ia_ref[0, 0, 0]

    tile_idx = pl.program_id(1)
    tile_base = tile_idx * np.int32(TILE)

    lrows = _rows(L)
    l_row_ids = jax.lax.broadcasted_iota(jnp.int32, (lrows, LANES), 0)
    l_col_ids = jax.lax.broadcasted_iota(jnp.int32, (lrows, LANES), 1)
    l_flat = l_row_ids * LANES + l_col_ids

    def make_ring_set(buf, n):
        rows = _rows(n)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        flat = row_ids * LANES + col_ids
        def ring_set(idx, value):
            # One masked whole-buffer write. (A row-predicated variant —
            # @pl.when per row so only the written row is touched — measured
            # 1.6-1.9x SLOWER on chip: the 66 scalar-unit branches per push
            # cost more than the 66-vreg masked RMW they avoid.)
            buf[:, :] = jnp.where(flat == idx, value, buf[:, :])

        return ring_set

    long_set = make_ring_set(long_buf, L)
    short_set = make_ring_set(short_buf, S)
    ratio_set = make_ring_set(ratio_buf, R)

    # --- load the carried state at the first tile of each stream ---
    @pl.when(tile_idx == 0)
    def _():
        long_buf[:, :] = long_in[0, :, :]
        short_buf[:, :] = short_in[0, :, :]
        ratio_buf[:, :] = ratio_in[0, :, :]
        for i in range(NI):
            ireg[i] = ireg_in[0, 0, i]
        for i in range(NF):
            freg[i] = freg_in[0, 0, i]

    def step(t, _):
        valid = valid_ref[0, 0, t] != 0
        mv = minvol_ref[0, 0, t]
        vr = ratio_ref[0, 0, t]
        win_idx = win_base_ref[0, 0, 0] + tile_base + t

        long_idx = ireg[I_LONG_IDX]
        long_cnt = ireg[I_LONG_CNT]
        long_last = freg[F_LONG_LAST]
        short_idx = ireg[I_SHORT_IDX]
        short_cnt = ireg[I_SHORT_CNT]
        ratio_idx = ireg[I_RATIO_IDX]
        ratio_cnt = ireg[I_RATIO_CNT]
        state = ireg[I_STATE]
        start_win = ireg[I_START]
        end_win = ireg[I_END]
        seg_sum = freg[F_SEG_SUM]
        seg_cnt = ireg[I_SEG_CNT]
        met_sec = freg[F_MET_SEC]

        # --- rolling averages (RollingAverage.zig semantics) ---
        @pl.when(valid)
        def _():
            short_set(short_idx, mv)
            ratio_set(ratio_idx, vr)

        short_cnt2 = jnp.minimum(short_cnt + 1, np.int32(S))
        ratio_cnt2 = jnp.minimum(ratio_cnt + 1, np.int32(R))
        short_avg = jnp.sum(short_buf[:, :]) / short_cnt2.astype(jnp.float32)
        ratio_avg = jnp.sum(ratio_buf[:, :]) / ratio_cnt2.astype(jnp.float32)

        if shape.has_initial_avg:
            base = long_last
        else:
            base = jnp.where(long_cnt > 0, long_last, short_avg)
        met = (short_avg > base * tf) & (ratio_avg > rth)

        # long-term only advances when the threshold is NOT met
        @pl.when(valid & jnp.logical_not(met))
        def _():
            long_set(long_idx, mv)

        long_cnt2 = jnp.minimum(long_cnt + 1, np.int32(L))
        long_avg2 = jnp.sum(long_buf[:, :]) / long_cnt2.astype(jnp.float32)
        push_long = jnp.logical_not(met)

        # --- state machine ---
        is_closed = state == fsm.CLOSED
        is_opening = state == fsm.OPENING
        is_open = state == fsm.OPEN
        is_closing = state == fsm.CLOSING

        t_closed_opening = is_closed & met
        opening_dur = (win_idx - start_win) * fftsz >= min_consec
        t_opening_open = is_opening & met & opening_dur
        t_opening_closed = is_opening & jnp.logical_not(met)
        t_open_closing = is_open & jnp.logical_not(met)
        closing_dur = (win_idx - end_win) * fftsz >= max_gap
        t_closing_open = is_closing & met
        t_closing_closed = is_closing & jnp.logical_not(met) & closing_dur

        new_state = state
        new_state = jnp.where(t_closed_opening, fsm.OPENING, new_state)
        new_state = jnp.where(t_opening_open, fsm.OPEN, new_state)
        new_state = jnp.where(t_opening_closed, fsm.CLOSED, new_state)
        new_state = jnp.where(t_open_closing, fsm.CLOSING, new_state)
        new_state = jnp.where(t_closing_open, fsm.OPEN, new_state)
        new_state = jnp.where(t_closing_closed, fsm.CLOSED, new_state)

        new_start = jnp.where(t_closed_opening, win_idx, start_win)
        new_end = jnp.where(t_open_closing, win_idx, end_win)

        length_sec = (
            (end_win - start_win).astype(jnp.float32) * np.float32(shape.fft_size) / sr
        )
        duration_met = length_sec >= min_dur
        seg_emitted = t_closing_closed & duration_met
        avg_ratio = seg_sum / jnp.maximum(seg_cnt, 1).astype(jnp.float32)

        event = jnp.int32(fsm.EV_NONE)
        event = jnp.where(t_opening_open, fsm.EV_STARTED, event)
        event = jnp.where(seg_emitted, fsm.EV_COMPLETED, event)
        event = jnp.where(
            t_closing_closed & jnp.logical_not(duration_met), fsm.EV_ABORTED, event
        )
        event_win = jnp.where(
            event == fsm.EV_STARTED,
            new_start,
            jnp.where(event == fsm.EV_COMPLETED, end_win, 0),
        )

        event_ref[0, 0, t] = jnp.where(valid, event, fsm.EV_NONE)
        eventwin_ref[0, 0, t] = jnp.where(valid, event_win, 0)
        segvalid_ref[0, 0, t] = (valid & seg_emitted).astype(jnp.int32)
        segstart_ref[0, 0, t] = start_win
        segend_ref[0, 0, t] = end_win
        segratio_ref[0, 0, t] = avg_ratio
        segmet_ref[0, 0, t] = met_sec

        # --- per-segment stats (trackSpeechStats) ---
        new_seg_sum = seg_sum
        new_seg_cnt = seg_cnt
        new_met_sec = met_sec
        new_seg_sum = jnp.where(t_closed_opening, vr, new_seg_sum)
        new_seg_cnt = jnp.where(t_closed_opening, 1, new_seg_cnt)
        new_met_sec = jnp.where(t_closed_opening, win_sec, new_met_sec)
        new_seg_sum = jnp.where(is_open, new_seg_sum + vr, new_seg_sum)
        new_seg_cnt = jnp.where(is_open, new_seg_cnt + 1, new_seg_cnt)
        new_met_sec = jnp.where(is_open & met, new_met_sec + win_sec, new_met_sec)

        # Register writeback, gated on validity (invalid windows freeze all
        # state; the ring writes above were already gated).
        @pl.when(valid)
        def _():
            ireg[I_LONG_IDX] = jnp.where(
                push_long, jax.lax.rem(long_idx + 1, np.int32(L)), long_idx
            )
            ireg[I_LONG_CNT] = jnp.where(push_long, long_cnt2, long_cnt)
            freg[F_LONG_LAST] = jnp.where(push_long, long_avg2, long_last)
            ireg[I_SHORT_IDX] = jax.lax.rem(short_idx + 1, np.int32(S))
            ireg[I_SHORT_CNT] = short_cnt2
            ireg[I_RATIO_IDX] = jax.lax.rem(ratio_idx + 1, np.int32(R))
            ireg[I_RATIO_CNT] = ratio_cnt2
            ireg[I_STATE] = new_state
            ireg[I_START] = new_start
            ireg[I_END] = new_end
            freg[F_SEG_SUM] = new_seg_sum
            ireg[I_SEG_CNT] = new_seg_cnt
            freg[F_MET_SEC] = new_met_sec

        return 0

    jax.lax.fori_loop(0, TILE, step, 0)

    # --- emit the final carry at the last tile ---
    @pl.when(tile_idx == pl.num_programs(1) - 1)
    def _():
        long_out[0, :, :] = long_buf[:, :]
        short_out[0, :, :] = short_buf[:, :]
        ratio_out[0, :, :] = ratio_buf[:, :]
        for i in range(NI):
            ireg_out[0, 0, i] = ireg[i]
        for i in range(NF):
            freg_out[0, 0, i] = freg[i]


def _ring_to_kernel(buf_1d: jnp.ndarray, n: int) -> jnp.ndarray:
    """[..., n] ring buffer -> [..., rows(n), 128] kernel layout (zero pad)."""
    rows = _rows(n)
    pad = rows * LANES - n
    x = jnp.pad(buf_1d, [(0, 0)] * (buf_1d.ndim - 1) + [(0, pad)])
    return x.reshape(x.shape[:-1] + (rows, LANES))


def _ring_from_kernel(buf_2d: jnp.ndarray, n: int) -> jnp.ndarray:
    return buf_2d.reshape(buf_2d.shape[:-2] + (-1,))[..., :n]


def pack_carry(shape: fsm.FSMShape, carry: dict) -> tuple:
    """fsm.init_carry-style dict [B, ...] -> kernel arrays
    (long [B,rows,128], short, ratio, ireg [B,NI] i32, freg [B,NF] f32)."""
    long_b = _ring_to_kernel(carry["long_buf"], shape.long_window)
    short_b = _ring_to_kernel(carry["short_buf"], shape.short_window)
    ratio_b = _ring_to_kernel(carry["ratio_buf"], shape.ratio_window)
    ireg = jnp.stack(
        [
            carry["long_idx"], carry["long_cnt"], carry["short_idx"],
            carry["short_cnt"], carry["ratio_idx"], carry["ratio_cnt"],
            carry["state"], carry["start_win"], carry["end_win"],
            carry["seg_ratio_cnt"],
        ],
        axis=-1,
    ).astype(jnp.int32)
    freg = jnp.stack(
        [carry["long_last"], carry["seg_ratio_sum"], carry["met_sec"]], axis=-1
    ).astype(jnp.float32)
    return long_b, short_b, ratio_b, ireg, freg


def unpack_carry(shape: fsm.FSMShape, long_b, short_b, ratio_b, ireg, freg) -> dict:
    return {
        "long_buf": _ring_from_kernel(long_b, shape.long_window),
        "long_idx": ireg[..., I_LONG_IDX],
        "long_cnt": ireg[..., I_LONG_CNT],
        "long_last": freg[..., F_LONG_LAST],
        "short_buf": _ring_from_kernel(short_b, shape.short_window),
        "short_idx": ireg[..., I_SHORT_IDX],
        "short_cnt": ireg[..., I_SHORT_CNT],
        "ratio_buf": _ring_from_kernel(ratio_b, shape.ratio_window),
        "ratio_idx": ireg[..., I_RATIO_IDX],
        "ratio_cnt": ireg[..., I_RATIO_CNT],
        "state": ireg[..., I_STATE],
        "start_win": ireg[..., I_START],
        "end_win": ireg[..., I_END],
        "seg_ratio_sum": freg[..., F_SEG_SUM],
        "seg_ratio_cnt": ireg[..., I_SEG_CNT],
        "met_sec": freg[..., F_MET_SEC],
    }


def scan_windows_pallas(
    shape: fsm.FSMShape,
    params: fsm.FSMParams,
    min_volumes: jnp.ndarray,  # [B, W]
    volume_ratios: jnp.ndarray,  # [B, W]
    valids: jnp.ndarray,  # [B, W] bool
    carry: dict | None = None,  # fsm carry with leading [B] axis
    win_base: jnp.ndarray | None = None,  # [B] i32 first-window indices
    interpret: bool = False,
    return_carry: bool = False,
):
    """Run the full FSM window scan as tiled Pallas programs.

    With no carry/win_base: fresh initial state, window indices 0..W-1.
    With them (slab chaining): continues the given per-stream state.
    FSMParams leaves may be scalars (shared) or [B] vectors (per-stream —
    heterogeneous configs / parameter sweeps flattened into the row axis).
    Returns WindowOutput [B, W] (and the final carry when return_carry).
    """
    b, w = min_volumes.shape
    w_pad = ((w + TILE - 1) // TILE) * TILE
    n_tiles = w_pad // TILE

    if carry is None:
        carry = jax.vmap(lambda _: fsm.init_carry(shape, params))(jnp.arange(b))
    if win_base is None:
        win_base = jnp.zeros((b,), jnp.int32)
    long_b, short_b, ratio_b, ireg, freg = pack_carry(shape, carry)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, w_pad - w)))

    kernel = functools.partial(_kernel, shape)

    lrows = _rows(shape.long_window)
    srows = _rows(shape.short_window)
    rrows = _rows(shape.ratio_window)

    in_spec = pl.BlockSpec((1, 1, TILE), lambda i, j: (i, 0, j), memory_space=pltpu.SMEM)
    # Per-stream scalar/register arrays live as [B, 1, N] so every block's
    # trailing two dims equal the array dims (the Mosaic tiling rule).
    per_stream_smem = pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, 1, TILE), lambda i, j: (i, 0, j), memory_space=pltpu.SMEM)

    def ring_spec(rows):
        return pl.BlockSpec((1, rows, LANES), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)

    def reg_spec(n):
        return pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM)

    def smem_scalar(x, dtype):
        """Per-stream parameter [B, 1, 1]: scalars broadcast, [B] pass."""
        x = jnp.asarray(x, dtype)
        if x.ndim == 0:
            x = jnp.broadcast_to(x, (b,))
        return x.reshape(b, 1, 1)

    outs = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[in_spec, in_spec, in_spec]
        + [per_stream_smem] * 6
        + [per_stream_smem]
        + [ring_spec(lrows), ring_spec(srows), ring_spec(rrows), reg_spec(NI), reg_spec(NF)],
        out_specs=[out_spec] * 7
        + [ring_spec(lrows), ring_spec(srows), ring_spec(rrows), reg_spec(NI), reg_spec(NF)],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.int32),  # event
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.int32),  # event_win
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.int32),  # seg_valid
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.int32),  # seg_start
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.int32),  # seg_end
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.float32),  # seg_ratio
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.float32),  # seg_met
            jax.ShapeDtypeStruct((b, lrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, srows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, rrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, NI), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, NF), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((lrows, LANES), jnp.float32),
            pltpu.VMEM((srows, LANES), jnp.float32),
            pltpu.VMEM((rrows, LANES), jnp.float32),
            pltpu.SMEM((NI,), jnp.int32),
            pltpu.SMEM((NF,), jnp.float32),
        ],
        interpret=interpret,
    )(
        pad(min_volumes)[:, None, :],
        pad(volume_ratios)[:, None, :],
        pad(valids.astype(jnp.int32))[:, None, :],
        smem_scalar(params.threshold_factor, jnp.float32),
        smem_scalar(params.ratio_threshold, jnp.float32),
        smem_scalar(params.min_consecutive_samples, jnp.int32),
        smem_scalar(params.max_gap_samples, jnp.int32),
        smem_scalar(params.min_duration_sec, jnp.float32),
        smem_scalar(params.initial_long_term_avg, jnp.float32),
        win_base.astype(jnp.int32)[:, None, None],
        long_b,
        short_b,
        ratio_b,
        ireg[:, None, :],
        freg[:, None, :],
    )
    event, event_win, seg_valid, seg_start, seg_end, seg_ratio, seg_met = (
        o[:, 0, :w] for o in outs[:7]
    )
    win_out = fsm.WindowOutput(
        event=event,
        event_win=event_win,
        seg_valid=seg_valid.astype(bool),
        seg_start_win=seg_start,
        seg_end_win=seg_end,
        seg_ratio=seg_ratio,
        seg_met_sec=seg_met,
    )
    if not return_carry:
        return win_out
    lb, sb, rb, ireg_o, freg_o = outs[7:]
    new_carry = unpack_carry(shape, lb, sb, rb, ireg_o[:, 0, :], freg_o[:, 0, :])
    return win_out, new_carry
