"""Speech-detection state machine as a `lax.scan` body.

Re-implements the reference's VADMachine (``src/AudioPipeline/VADMachine.zig``)
— rolling averages + 4-state hysteresis FSM — as pure tensor ops so it can be
vmapped over streams (data parallelism) *and* over alternative configurations:
the reference's ``alt_vad_machine_configs`` parameter-sweep mechanism
(VADPipeline.zig:111-123) runs K state machines over one shared FFT stream,
which here is a second vmap axis over ``FSMParams`` (the dynamic thresholds)
while ``FSMShape`` (ring-buffer sizes — static shapes) stays shared.

State layout notes:

* The three rolling averages (RollingAverage.zig) are fixed-size ring buffers
  recomputed with a full sum on every push, exactly like the reference's O(n)
  ``avg()`` — at these sizes (8437 / 9 / 23 floats) a VPU-vectorized sum per
  window is effectively free. The reference accumulates in f64; we use f32
  (TPU has no fast f64) — the threshold comparison has a 10x margin, and the
  golden tests confirm segment-identical decisions vs the f64 mirror.
* Time is quantized to FFT windows (1024 samples); all FSM indices are window
  counts (int32) so multi-hour streams can't overflow; sample numbers are
  reconstructed as ``win * fft_size`` on the host.
* The long-term average freezes while the threshold is met
  (VADMachine.zig:176-178), which couples each window's average update to the
  FSM decision — inherently sequential, hence the scan.

States: 0=closed, 1=opening, 2=open, 3=closing (VADMachine.zig:11-16).
Event codes: 0=none, 1=started, 2=completed, 3=aborted (VADMachine.zig:19-24).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VADMachineConfig

CLOSED, OPENING, OPEN, CLOSING = 0, 1, 2, 3
EV_NONE, EV_STARTED, EV_COMPLETED, EV_ABORTED = 0, 1, 2, 3


class FSMShape(NamedTuple):
    """Static (python-level) structure derived from a VADMachineConfig:
    anything that determines array shapes or compile-time branches."""

    long_window: int
    short_window: int
    ratio_window: int
    has_initial_avg: bool
    fft_size: int
    sample_rate: int
    window_sec: float  # fft_size / sample_rate, as f32


class FSMParams(NamedTuple):
    """Dynamic (traced) thresholds — a pytree, vmappable for config sweeps."""

    threshold_factor: jnp.ndarray  # f32
    ratio_threshold: jnp.ndarray  # f32
    min_consecutive_samples: jnp.ndarray  # i32
    max_gap_samples: jnp.ndarray  # i32
    min_duration_sec: jnp.ndarray  # f32
    initial_long_term_avg: jnp.ndarray  # f32 (only used by init_carry)


def statics_from_config(
    cfg: VADMachineConfig, sample_rate: int, fft_size: int
) -> tuple[FSMShape, FSMParams]:
    shape = FSMShape(
        long_window=cfg.long_term_window(sample_rate, fft_size),
        short_window=cfg.short_term_window(sample_rate, fft_size),
        ratio_window=cfg.channel_ratio_window(sample_rate, fft_size),
        has_initial_avg=cfg.initial_long_term_avg is not None,
        fft_size=fft_size,
        sample_rate=sample_rate,
        window_sec=float(np.float32(fft_size) / np.float32(sample_rate)),
    )
    params = FSMParams(
        threshold_factor=jnp.float32(cfg.speech_threshold_factor),
        ratio_threshold=jnp.float32(cfg.channel_vol_ratio_threshold),
        min_consecutive_samples=jnp.int32(cfg.min_consecutive_samples_to_open(sample_rate)),
        max_gap_samples=jnp.int32(cfg.max_gap_samples(sample_rate)),
        min_duration_sec=jnp.float32(cfg.min_vad_duration_sec),
        initial_long_term_avg=jnp.float32(cfg.initial_long_term_avg or 0.0),
    )
    return shape, params


def init_carry(shape: FSMShape, params: FSMParams, dtype=jnp.float32) -> dict[str, Any]:
    if shape.has_initial_avg:
        init_avg = params.initial_long_term_avg.astype(dtype)
        long_buf = jnp.full((shape.long_window,), 1.0, dtype) * init_avg
        long_cnt = jnp.int32(shape.long_window)
        long_last = init_avg
    else:
        long_buf = jnp.zeros((shape.long_window,), dtype)
        long_cnt = jnp.int32(0)
        long_last = jnp.asarray(0.0, dtype)
    return {
        "long_buf": long_buf,
        "long_idx": jnp.int32(0),
        "long_cnt": long_cnt,
        "long_last": long_last,
        "short_buf": jnp.zeros((shape.short_window,), dtype),
        "short_idx": jnp.int32(0),
        "short_cnt": jnp.int32(0),
        "ratio_buf": jnp.zeros((shape.ratio_window,), dtype),
        "ratio_idx": jnp.int32(0),
        "ratio_cnt": jnp.int32(0),
        "state": jnp.int32(CLOSED),
        "start_win": jnp.int32(0),
        "end_win": jnp.int32(0),
        "seg_ratio_sum": jnp.asarray(0.0, dtype),
        "seg_ratio_cnt": jnp.int32(0),
        "met_sec": jnp.asarray(0.0, dtype),
    }


class WindowOutput(NamedTuple):
    """Per-window FSM outputs (all masked by the caller's validity)."""

    event: jnp.ndarray  # int32 event code
    event_win: jnp.ndarray  # int32 window index payload (start for STARTED, end for COMPLETED)
    seg_valid: jnp.ndarray  # bool: a speech segment was emitted at this window
    seg_start_win: jnp.ndarray  # int32
    seg_end_win: jnp.ndarray  # int32
    seg_ratio: jnp.ndarray  # f32 avg channel volume ratio over the segment
    seg_met_sec: jnp.ndarray  # f32 cumulative seconds the threshold was met


def _ring_push(buf, idx, cnt, value, window):
    """Push into a ring buffer and return (buf', idx', cnt', mean).

    Mirrors RollingAverage.push/avg (RollingAverage.zig:34-56): only the first
    ``cnt`` storage slots are averaged; unwritten slots are zero so a full-sum
    divided by cnt is identical.
    """
    buf = buf.at[idx].set(value)
    idx = jax.lax.rem(idx + 1, jnp.int32(window))
    cnt = jnp.minimum(cnt + 1, jnp.int32(window))
    mean = jnp.sum(buf) / cnt.astype(buf.dtype)
    return buf, idx, cnt, mean


def step_window(
    shape: FSMShape,
    params: FSMParams,
    carry: dict[str, Any],
    min_volume: jnp.ndarray,
    volume_ratio: jnp.ndarray,
    win_idx: jnp.ndarray,
    valid: jnp.ndarray,
) -> tuple[dict[str, Any], WindowOutput]:
    """Process one FFT window through the state machine (VADMachine.zig:138-239).

    Args:
      min_volume: min over channels of speech-band volume for this window.
      volume_ratio: the window's weighted channel volume ratio.
      win_idx: global window index (int32); sample index == win_idx * fft_size.
      valid: bool; when False the carry passes through and outputs are inert
        (used for padded chunks in batched/ragged streams).
    """
    c = dict(carry)

    short_buf, short_idx, short_cnt, short_avg = _ring_push(
        c["short_buf"], c["short_idx"], c["short_cnt"], min_volume, shape.short_window
    )
    ratio_buf, ratio_idx, ratio_cnt, ratio_avg = _ring_push(
        c["ratio_buf"], c["ratio_idx"], c["ratio_cnt"], volume_ratio, shape.ratio_window
    )

    # threshold_base = long_term.last_avg orelse initial orelse short_term
    # (VADMachine.zig:169). With an initial value, last_avg always exists;
    # the no-initial fallback is the short-term average.
    if shape.has_initial_avg:
        base = c["long_last"]
    else:
        base = jnp.where(c["long_cnt"] > 0, c["long_last"], short_avg)

    threshold = base * params.threshold_factor
    met = (short_avg > threshold) & (ratio_avg > params.ratio_threshold)

    # Long-term average only advances when the threshold is NOT met
    # (VADMachine.zig:176-178).
    long_buf2, long_idx2, long_cnt2, long_avg2 = _ring_push(
        c["long_buf"], c["long_idx"], c["long_cnt"], min_volume, shape.long_window
    )
    push_long = jnp.logical_not(met)
    long_buf = jnp.where(push_long, long_buf2, c["long_buf"])
    long_idx = jnp.where(push_long, long_idx2, c["long_idx"])
    long_cnt = jnp.where(push_long, long_cnt2, c["long_cnt"])
    long_last = jnp.where(push_long, long_avg2, c["long_last"])

    # ---- state machine -----------------------------------------------------
    state = c["state"]
    start_win = c["start_win"]
    end_win = c["end_win"]

    is_closed = state == CLOSED
    is_opening = state == OPENING
    is_open = state == OPEN
    is_closing = state == CLOSING

    fftsz = jnp.int32(shape.fft_size)
    samples_since_open = (win_idx - start_win) * fftsz
    samples_since_close = (win_idx - end_win) * fftsz
    opening_duration_met = samples_since_open >= params.min_consecutive_samples
    closing_duration_met = samples_since_close >= params.max_gap_samples

    # closed -> opening
    t_closed_opening = is_closed & met
    # opening -> open (emit STARTED) / opening -> closed
    t_opening_open = is_opening & met & opening_duration_met
    t_opening_closed = is_opening & jnp.logical_not(met)
    # open -> closing
    t_open_closing = is_open & jnp.logical_not(met)
    # closing -> open / closing -> closed (speech end)
    t_closing_open = is_closing & met
    t_closing_closed = is_closing & jnp.logical_not(met) & closing_duration_met

    new_state = state
    new_state = jnp.where(t_closed_opening, OPENING, new_state)
    new_state = jnp.where(t_opening_open, OPEN, new_state)
    new_state = jnp.where(t_opening_closed, CLOSED, new_state)
    new_state = jnp.where(t_open_closing, CLOSING, new_state)
    new_state = jnp.where(t_closing_open, OPEN, new_state)
    new_state = jnp.where(t_closing_closed, CLOSED, new_state)

    new_start_win = jnp.where(t_closed_opening, win_idx, start_win)
    new_end_win = jnp.where(t_open_closing, win_idx, end_win)

    # ---- speech end (VADMachine.zig:265-309) -------------------------------
    # Float multiply (not int32) so multi-hour segments can't overflow.
    length_sec = (
        (end_win - start_win).astype(jnp.float32) * np.float32(shape.fft_size)
    ) / np.float32(shape.sample_rate)
    duration_met = length_sec >= params.min_duration_sec
    seg_emitted = t_closing_closed & duration_met
    avg_ratio = c["seg_ratio_sum"] / jnp.maximum(c["seg_ratio_cnt"], 1).astype(jnp.float32)

    event = jnp.int32(EV_NONE)
    event = jnp.where(t_opening_open, EV_STARTED, event)
    event = jnp.where(seg_emitted, EV_COMPLETED, event)
    event = jnp.where(t_closing_closed & jnp.logical_not(duration_met), EV_ABORTED, event)
    event_win = jnp.where(
        event == EV_STARTED, new_start_win, jnp.where(event == EV_COMPLETED, end_win, 0)
    ).astype(jnp.int32)

    # ---- per-segment stats (trackSpeechStats, VADMachine.zig:241-263) ------
    win_sec = np.float32(shape.window_sec)
    seg_ratio_sum = c["seg_ratio_sum"]
    seg_ratio_cnt = c["seg_ratio_cnt"]
    met_sec = c["met_sec"]
    # from closed -> opening: reset stats to this window's values
    seg_ratio_sum = jnp.where(t_closed_opening, volume_ratio, seg_ratio_sum)
    seg_ratio_cnt = jnp.where(t_closed_opening, 1, seg_ratio_cnt)
    met_sec = jnp.where(t_closed_opening, win_sec, met_sec)
    # from open (any destination): accumulate
    from_open = is_open
    seg_ratio_sum = jnp.where(from_open, seg_ratio_sum + volume_ratio, seg_ratio_sum)
    seg_ratio_cnt = jnp.where(from_open, seg_ratio_cnt + 1, seg_ratio_cnt)
    met_sec = jnp.where(from_open & met, met_sec + win_sec, met_sec)

    out = WindowOutput(
        event=jnp.where(valid, event, EV_NONE),
        event_win=jnp.where(valid, event_win, 0),
        seg_valid=valid & seg_emitted,
        seg_start_win=start_win,
        seg_end_win=end_win,
        seg_ratio=avg_ratio,
        seg_met_sec=c["met_sec"],
    )

    new_carry = {
        "long_buf": long_buf,
        "long_idx": long_idx,
        "long_cnt": long_cnt,
        "long_last": long_last,
        "short_buf": short_buf,
        "short_idx": short_idx,
        "short_cnt": short_cnt,
        "ratio_buf": ratio_buf,
        "ratio_idx": ratio_idx,
        "ratio_cnt": ratio_cnt,
        "state": new_state,
        "start_win": new_start_win,
        "end_win": new_end_win,
        "seg_ratio_sum": seg_ratio_sum,
        "seg_ratio_cnt": seg_ratio_cnt,
        "met_sec": met_sec,
    }
    # Freeze the carry entirely for invalid (padding) windows.
    new_carry = jax.tree_util.tree_map(
        lambda new, old: jnp.where(valid, new, old), new_carry, carry
    )
    return new_carry, out


def scan_windows_rows(
    shape: FSMShape,
    params_rows: FSMParams,  # leaves [N] — per-row machine parameters
    carries: dict[str, Any],  # leaves [N, ...]
    min_volumes: jnp.ndarray,  # [N, W]
    volume_ratios: jnp.ndarray,  # [N, W]
    win_indices: jnp.ndarray,  # [N, W]
    valids: jnp.ndarray,  # [N, W]
) -> tuple[dict[str, Any], WindowOutput]:
    """Row-parallel FSM scan: N independent machines (streams x configs
    flattened), each with its own parameters and carry."""

    def one(p, c, mv, vr, wi, va):
        def body(cc, xs):
            return step_window(shape, p, cc, *xs)

        return jax.lax.scan(body, c, (mv, vr, wi, va))

    return jax.vmap(one)(params_rows, carries, min_volumes, volume_ratios, win_indices, valids)


def scan_windows(
    shape: FSMShape,
    params: FSMParams,
    carry: dict[str, Any],
    min_volumes: jnp.ndarray,
    volume_ratios: jnp.ndarray,
    win_indices: jnp.ndarray,
    valids: jnp.ndarray,
) -> tuple[dict[str, Any], WindowOutput]:
    """Scan the FSM over a chunk's window slots (leading axis).

    If ``params``/``carry`` carry a leading machine axis K (alt-config sweep),
    the scan body vmaps over it: K state machines consume the same window
    stream, exactly like VADPipeline.zig:232-236 but data-parallel.
    """
    n_machines = np.ndim(params.threshold_factor) and params.threshold_factor.shape[0]

    def body(c, xs):
        mv, vr, wi, va = xs
        if n_machines:
            return jax.vmap(
                lambda p, cc: step_window(shape, p, cc, mv, vr, wi, va)
            )(params, c)
        return step_window(shape, params, c, mv, vr, wi, va)

    return jax.lax.scan(body, carry, (min_volumes, volume_ratios, win_indices, valids))
