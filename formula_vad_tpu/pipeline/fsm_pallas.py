"""Pallas TPU kernel for the speech-FSM window scan.

The FSM is the only inherently sequential stage of the offline pipeline
(VADMachine.zig:176-178 couples the rolling-average update to the FSM
decision), so after the chunk-parallel rewrite it bounds the wall-clock:
as a ``lax.scan`` it executes ~1 tiny HLO loop iteration per 21 ms window.

This kernel runs the ENTIRE window scan inside Pallas programs with no
per-step dispatch:

* grid = (n_streams, n_tiles): the tile axis is minor, so for each stream
  the tiles execute sequentially on the core — per-stream state survives
  across tiles in the output blocks (constant index_map) and SMEM scratch.
* per-window scalars (inputs and outputs) live in SMEM blocks.
* the three rolling-average ring buffers are FLAT SMEM ARRAYS living in
  the OUTPUT blocks, seeded from the input blocks at tile 0 by SMEM->SMEM
  DMA and then mutated in place with single branch-free scalar
  select-stores. The running averages are maintained as Kahan-compensated
  incremental sums in the loop carry (seeded per call with an exact
  ``jnp.sum`` of the ring, so the value is always within ~1 ulp of the
  reference's recompute-on-push sum, RollingAverage.zig:45-56 — see
  PARITY.md deviation 9). This design is the fourth iteration; measured
  on chip at the bench shape: masked whole-buffer VMEM writes + full VPU
  re-reductions cost ~250 ns/window of serial VMEM latency (7.0 ms);
  8-row sub-blocked and dynamic-row (`pl.ds`) variants were no better or
  worse; SMEM scalar ring ops measure ~40 ns/window (2.7 ms kernel)
  because the scalar core's dependent-access latency is far below the
  VPU's VMEM RMW+reduce chain. Two real-Mosaic pitfalls cost a debugging
  cycle and are load-bearing here: ``input_output_aliases`` on SMEM
  blocks does NOT seed outputs with input data before the first write
  (reads give zeros; the interpreter seeds them), and a data-dependent
  ``pl.when`` around a dynamic SMEM store miscompiles/hangs.
* the 13 FSM registers thread through the ``fori_loop`` carry (SSA machine
  registers), spilled to the register-file output block once per tile.

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

TILE = 512  # windows per grid step (~10.9 s of audio)
MAX_RING = 1 << 16  # SMEM ring cap (~23 min of rolling window)

# Register-file layout (int32 / float32 carry blocks)
I_LONG_IDX, I_LONG_CNT, I_SHORT_IDX, I_SHORT_CNT, I_RATIO_IDX, I_RATIO_CNT, \
    I_STATE, I_START, I_END, I_SEG_CNT = range(10)
NI = 10
F_LONG_LAST, F_SEG_SUM, F_MET_SEC = range(3)
NF = 3


def _kernel(
    shape: fsm.FSMShape,
    # inputs (SMEM blocks [1, 1, TILE] except scalars [1, 1, 1])
    minvol_ref,
    ratio_ref,
    valid_ref,
    tf_ref,
    rt_ref,
    mc_ref,
    mg_ref,
    md_ref,
    win_base_ref,  # [1, 1, 1] i32: global index of this stream's first window
    sums_ref,  # [1, 1, 3] f32: exact initial ring sums (long, short, ratio)
    long_in,  # initial carry (copied into the *_io outputs at tile 0)
    short_in,
    ratio_in,
    ireg_in,
    freg_in,
    # outputs (SMEM blocks [1, 1, TILE]) + carry (aliased, in-place)
    event_ref,
    eventwin_ref,
    segvalid_ref,
    segstart_ref,
    segend_ref,
    segratio_ref,
    segmet_ref,
    long_io,  # [1, 1, L] f32 flat ring (SMEM; the live mutable ring)
    short_io,  # [1, 1, S]
    ratio_io,  # [1, 1, R]
    ireg_io,  # [1, 1, NI] i32
    freg_io,  # [1, 1, NF] f32
    # scratch
    ksum,  # SMEM (6,) f32: cross-tile Kahan (sum, comp) x (long, short, ratio)
    copy_sem,  # DMA semaphores (3,) for the tile-0 carry copies
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

    tile_idx = pl.program_id(1)
    tile_base = tile_idx * np.int32(TILE)

    # Seed the output-resident carry state from the input blocks at tile 0.
    # (input_output_aliases would make this free, but on real Mosaic an
    # aliased SMEM output does NOT see the input data before its first
    # write — reads returned zeros while the interpreter behaved; the ring
    # copy is a single SMEM->SMEM DMA instead.)
    @pl.when(tile_idx == 0)
    def _():
        for k in range(3):
            ksum[2 * k] = sums_ref[0, 0, k]
            ksum[2 * k + 1] = jnp.float32(0.0)
        for i in range(NI):
            ireg_io[0, 0, i] = ireg_in[0, 0, i]
        for i in range(NF):
            freg_io[0, 0, i] = freg_in[0, 0, i]
        for src, dst, sem_slot in (
            (long_in, long_io, 0), (short_in, short_io, 1), (ratio_in, ratio_io, 2)
        ):
            pltpu.make_async_copy(src, dst, copy_sem.at[sem_slot]).start()
        for src, dst, sem_slot in (
            (long_in, long_io, 0), (short_in, short_io, 1), (ratio_in, ratio_io, 2)
        ):
            pltpu.make_async_copy(src, dst, copy_sem.at[sem_slot]).wait()

    def ring_push(ref, n, idx, val, s, comp, do_push):
        """Overwrite ring slot ``idx`` with ``val`` (when do_push) and
        return the compensated updated (sum, comp): s + (val - evicted).

        The store is UNCONDITIONAL with a selected value (old when not
        pushing) — a data-dependent ``pl.when`` around a dynamic SMEM
        store miscompiled/hung on real Mosaic; the select-store is
        branch-free and semantically identical."""
        old = ref[0, 0, idx]
        ref[0, 0, idx] = jnp.where(do_push, val, old)
        y = (val - old) - comp
        t2 = s + y
        c2 = (t2 - s) - y
        return jnp.where(do_push, t2, s), jnp.where(do_push, c2, comp)

    def step(t, carry):
        (long_idx, long_cnt, long_last, short_idx, short_cnt, ratio_idx,
         ratio_cnt, state, start_win, end_win, seg_sum, seg_cnt, met_sec,
         ls, lc, ss, sc, rs, rc) = carry
        valid = valid_ref[0, 0, t] != 0
        mv = minvol_ref[0, 0, t]
        vr = ratio_ref[0, 0, t]
        win_idx = win_base_ref[0, 0, 0] + tile_base + t

        # --- rolling averages (RollingAverage.zig semantics) ---
        ss, sc = ring_push(short_io, S, short_idx, mv, ss, sc, valid)
        rs, rc = ring_push(ratio_io, R, ratio_idx, vr, rs, rc, valid)
        short_cnt2 = jnp.minimum(short_cnt + 1, np.int32(S))
        ratio_cnt2 = jnp.minimum(ratio_cnt + 1, np.int32(R))
        short_avg = ss / short_cnt2.astype(jnp.float32)
        ratio_avg = rs / ratio_cnt2.astype(jnp.float32)

        if shape.has_initial_avg:
            base = long_last
        else:
            base = jnp.where(long_cnt > 0, long_last, short_avg)
        met = (short_avg > base * tf) & (ratio_avg > rth)

        # long-term only advances when the threshold is NOT met
        push_long = jnp.logical_not(met)
        ls, lc = ring_push(long_io, L, long_idx, mv, ls, lc, valid & push_long)
        long_cnt2 = jnp.minimum(long_cnt + 1, np.int32(L))
        long_avg2 = ls / long_cnt2.astype(jnp.float32)

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

        # Carry update, gated on validity via selects (invalid windows
        # freeze all state; the ring/sum writes above were already gated).
        def sel(new, old):
            return jnp.where(valid, new, old)

        return (
            sel(jnp.where(push_long, jax.lax.rem(long_idx + 1, np.int32(L)), long_idx),
                long_idx),
            sel(jnp.where(push_long, long_cnt2, long_cnt), long_cnt),
            sel(jnp.where(push_long, long_avg2, long_last), long_last),
            sel(jax.lax.rem(short_idx + 1, np.int32(S)), short_idx),
            sel(short_cnt2, short_cnt),
            sel(jax.lax.rem(ratio_idx + 1, np.int32(R)), ratio_idx),
            sel(ratio_cnt2, ratio_cnt),
            sel(new_state, state),
            sel(new_start, start_win),
            sel(new_end, end_win),
            sel(new_seg_sum, seg_sum),
            sel(new_seg_cnt, seg_cnt),
            sel(new_met_sec, met_sec),
            ls, lc, ss, sc, rs, rc,
        )

    carry0 = (
        ireg_io[0, 0, I_LONG_IDX], ireg_io[0, 0, I_LONG_CNT],
        freg_io[0, 0, F_LONG_LAST],
        ireg_io[0, 0, I_SHORT_IDX], ireg_io[0, 0, I_SHORT_CNT],
        ireg_io[0, 0, I_RATIO_IDX], ireg_io[0, 0, I_RATIO_CNT],
        ireg_io[0, 0, I_STATE], ireg_io[0, 0, I_START], ireg_io[0, 0, I_END],
        freg_io[0, 0, F_SEG_SUM], ireg_io[0, 0, I_SEG_CNT],
        freg_io[0, 0, F_MET_SEC],
        ksum[0], ksum[1], ksum[2], ksum[3], ksum[4], ksum[5],
    )
    final = jax.lax.fori_loop(0, TILE, step, carry0)

    # Spill the register file / Kahan state once per tile; the aliased
    # register block doubles as the cross-tile store and the final output.
    ireg_io[0, 0, I_LONG_IDX] = final[0]
    ireg_io[0, 0, I_LONG_CNT] = final[1]
    freg_io[0, 0, F_LONG_LAST] = final[2]
    ireg_io[0, 0, I_SHORT_IDX] = final[3]
    ireg_io[0, 0, I_SHORT_CNT] = final[4]
    ireg_io[0, 0, I_RATIO_IDX] = final[5]
    ireg_io[0, 0, I_RATIO_CNT] = final[6]
    ireg_io[0, 0, I_STATE] = final[7]
    ireg_io[0, 0, I_START] = final[8]
    ireg_io[0, 0, I_END] = final[9]
    freg_io[0, 0, F_SEG_SUM] = final[10]
    ireg_io[0, 0, I_SEG_CNT] = final[11]
    freg_io[0, 0, F_MET_SEC] = final[12]
    for k in range(6):
        ksum[k] = final[13 + k]


def pack_carry(shape: fsm.FSMShape, carry: dict) -> tuple:
    """fsm.init_carry-style dict [B, ...] -> kernel arrays
    (long [B,1,L], short, ratio flat f32; ireg [B,1,NI] i32; freg [B,1,NF])."""
    long_b = carry["long_buf"][:, None, :]
    short_b = carry["short_buf"][:, None, :]
    ratio_b = carry["ratio_buf"][:, None, :]
    ireg = jnp.stack(
        [
            carry["long_idx"], carry["long_cnt"], carry["short_idx"],
            carry["short_cnt"], carry["ratio_idx"], carry["ratio_cnt"],
            carry["state"], carry["start_win"], carry["end_win"],
            carry["seg_ratio_cnt"],
        ],
        axis=-1,
    ).astype(jnp.int32)[:, None, :]
    freg = jnp.stack(
        [carry["long_last"], carry["seg_ratio_sum"], carry["met_sec"]], axis=-1
    ).astype(jnp.float32)[:, None, :]
    return long_b, short_b, ratio_b, ireg, freg


def unpack_carry(shape: fsm.FSMShape, long_b, short_b, ratio_b, ireg, freg) -> dict:
    return {
        "long_buf": long_b[:, 0, :],
        "long_idx": ireg[:, 0, I_LONG_IDX],
        "long_cnt": ireg[:, 0, I_LONG_CNT],
        "long_last": freg[:, 0, F_LONG_LAST],
        "short_buf": short_b[:, 0, :],
        "short_idx": ireg[:, 0, I_SHORT_IDX],
        "short_cnt": ireg[:, 0, I_SHORT_CNT],
        "ratio_buf": ratio_b[:, 0, :],
        "ratio_idx": ireg[:, 0, I_RATIO_IDX],
        "ratio_cnt": ireg[:, 0, I_RATIO_CNT],
        "state": ireg[:, 0, I_STATE],
        "start_win": ireg[:, 0, I_START],
        "end_win": ireg[:, 0, I_END],
        "seg_ratio_sum": freg[:, 0, F_SEG_SUM],
        "seg_ratio_cnt": ireg[:, 0, I_SEG_CNT],
        "met_sec": freg[:, 0, F_MET_SEC],
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
    if max(shape.long_window, shape.short_window, shape.ratio_window) > MAX_RING:
        raise NotImplementedError(
            f"rolling windows above {MAX_RING} slots exceed the kernel's "
            "SMEM ring budget; use the lax.scan path (fsm.scan_windows)"
        )

    if carry is None:
        carry = jax.vmap(lambda _: fsm.init_carry(shape, params))(jnp.arange(b))
    if win_base is None:
        win_base = jnp.zeros((b,), jnp.int32)
    long_b, short_b, ratio_b, ireg, freg = pack_carry(shape, carry)
    # Exact per-call seeds for the in-kernel Kahan sums.
    sums = jnp.stack(
        [
            jnp.sum(long_b[:, 0, :], axis=-1),
            jnp.sum(short_b[:, 0, :], axis=-1),
            jnp.sum(ratio_b[:, 0, :], axis=-1),
        ],
        axis=-1,
    )[:, None, :]

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, w_pad - w)))

    kernel = functools.partial(_kernel, shape)

    in_spec = pl.BlockSpec((1, 1, TILE), lambda i, j: (i, 0, j), memory_space=pltpu.SMEM)
    # Per-stream scalar/register arrays live as [B, 1, N] so every block's
    # trailing two dims equal the array dims (the Mosaic tiling rule).
    per_stream_smem = pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, 1, TILE), lambda i, j: (i, 0, j), memory_space=pltpu.SMEM)

    def reg_spec(n):
        return pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM)

    def smem_scalar(x, dtype):
        """Per-stream parameter [B, 1, 1]: scalars broadcast, [B] pass."""
        x = jnp.asarray(x, dtype)
        if x.ndim == 0:
            x = jnp.broadcast_to(x, (b,))
        return x.reshape(b, 1, 1)

    L, S, R = shape.long_window, shape.short_window, shape.ratio_window
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[in_spec, in_spec, in_spec]
        + [per_stream_smem] * 5
        + [per_stream_smem]
        + [reg_spec(3)]
        + [reg_spec(L), reg_spec(S), reg_spec(R), reg_spec(NI), reg_spec(NF)],
        out_specs=[out_spec] * 7
        + [reg_spec(L), reg_spec(S), reg_spec(R), reg_spec(NI), reg_spec(NF)],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.int32),  # event
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.int32),  # event_win
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.int32),  # seg_valid
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.int32),  # seg_start
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.int32),  # seg_end
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.float32),  # seg_ratio
            jax.ShapeDtypeStruct((b, 1, w_pad), jnp.float32),  # seg_met
            jax.ShapeDtypeStruct((b, 1, L), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, NI), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, NF), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((6,), jnp.float32),  # Kahan (sum, comp) x 3 rings
            pltpu.SemaphoreType.DMA((3,)),  # tile-0 carry-copy semaphores
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
        # (initial_long_term_avg is consumed by init_carry, not the kernel —
        # the seeded long_last/ring already carry it.)
        win_base.astype(jnp.int32)[:, None, None],
        sums,
        long_b,
        short_b,
        ratio_b,
        ireg,
        freg,
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
    new_carry = unpack_carry(shape, lb, sb, rb, ireg_o, freg_o)
    return win_out, new_carry
