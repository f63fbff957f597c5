"""Host-side FSM decode path (ctypes bindings for native/fvadfsm.cpp).

The speech FSM (VADMachine.zig:138-325) is the scoring pipeline's only
inherently serial stage: each window's rolling-average update depends on
the previous window's threshold decision.  The Pallas kernel
(``fsm_pallas``) runs that chain on the TPU scalar core at ~136 ns/window
— 2.7 ms of a 14 ms batched step (ROOFLINE.md).  A host core retires the
identical chain in a few ns/window, and during batched offline scoring
the host is idle while the device crunches the next slab — so decoding
on the host *overlaps* device compute instead of serializing it.  This
is also where the reference itself runs this logic (a CPU state machine
fed by device-produced per-window volumes).

The native decoder replicates ``fsm.step_window`` exactly (plain IEEE
f32/int32 in the reference order); the rolling averages are Kahan-
compensated f32 running sums like the Pallas kernel, so outputs are
bit-identical to the kernel path unless a threshold comparison lands on
an exact ulp tie of a ring average (PARITY.md deviation 9's class).
Unlike the kernel's per-call reseed, the Kahan state here is PART OF THE
CARRY, so slab chaining is exactly continuous with a one-shot run.

Usage mirrors ``fsm_pallas.scan_windows_pallas``::

    win_out, carry = scan_windows_host(
        shape, params, min_vol, ratios, valid, return_carry=True)

but inputs are fetched to host (``np.asarray``) and outputs are numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Any

import numpy as np

from . import fsm

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfvadfsm.so")

_lock = threading.Lock()
_lib = None
_tried = False

NK = 6  # per-stream Kahan slots: (sum, comp) x (long, short, ratio)


def _build(force: bool = False) -> bool:
    try:
        subprocess.run(
            ["make", "-s"] + (["-B"] if force else []) + ["libfvadfsm.so"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.isdir(_NATIVE_DIR):
            return None
        _build()
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            if not _build(force=True):
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                return None
        if lib.fvad_fsm_abi_version() != 1:
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        i32 = ctypes.c_int32
        f32 = ctypes.c_float
        lib.fvad_fsm_kahan_seed.argtypes = [f32p, f32p, f32p, i64, i64]
        lib.fvad_fsm_scan.argtypes = (
            [i64, i64]
            + [i32] * 6
            + [f32]
            + [f32p, f32p, i32p, i32p, f32p]  # per-stream params
            + [f32p, f32p, u8p, i32p]  # inputs
            + [f32p, f32p, f32p, i32p, f32p, f32p]  # carry
            + [i32p, i32p, u8p, i32p, i32p, f32p, f32p]  # outputs
        )
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _param_vec(x, b: int, dtype) -> np.ndarray:
    x = np.asarray(x, dtype)
    if x.ndim == 0:
        x = np.broadcast_to(x, (b,))
    elif x.shape != (b,):
        # The C decoder indexes params by stream row — a wrong-length
        # vector (e.g. untiled alt params, see tile_param_rows) would read
        # past the buffer.
        raise ValueError(
            f"per-stream parameter has shape {x.shape}, expected scalar or "
            f"({b},) — alt-config params must be tiled to rows first "
            "(fsm_host.tile_param_rows)"
        )
    return np.ascontiguousarray(x, dtype)


def _seed_kahan(lib, long_b, short_b, ratio_b) -> np.ndarray:
    b = long_b.shape[0]
    kahan = np.zeros((b, NK), np.float32)
    for k, buf in enumerate((long_b, short_b, ratio_b)):
        sums = np.zeros((b,), np.float32)
        comps = np.zeros((b,), np.float32)
        lib.fvad_fsm_kahan_seed(
            np.ascontiguousarray(buf, np.float32), sums, comps, b, buf.shape[1]
        )
        kahan[:, 2 * k] = sums
        kahan[:, 2 * k + 1] = comps
    return kahan


def host_carry(shape: fsm.FSMShape, carry: dict[str, Any]) -> dict[str, Any]:
    """Convert an ``fsm.init_carry``-style carry (leading [B] axis; jax or
    numpy leaves) into the host-resident numpy carry, seeding the Kahan
    running sums exactly from the ring contents."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native FSM decoder unavailable (g++/make missing?)")
    c = {k: np.asarray(v) for k, v in carry.items() if not k.startswith("_")}
    out = {
        "long_buf": np.ascontiguousarray(c["long_buf"], np.float32),
        "short_buf": np.ascontiguousarray(c["short_buf"], np.float32),
        "ratio_buf": np.ascontiguousarray(c["ratio_buf"], np.float32),
    }
    for k in (
        "long_idx", "long_cnt", "short_idx", "short_cnt", "ratio_idx",
        "ratio_cnt", "state", "start_win", "end_win", "seg_ratio_cnt",
    ):
        out[k] = np.ascontiguousarray(c[k], np.int32)
    for k in ("long_last", "seg_ratio_sum", "met_sec"):
        out[k] = np.ascontiguousarray(c[k], np.float32)
    out["_kahan"] = (
        np.ascontiguousarray(carry["_kahan"], np.float32)
        if "_kahan" in carry
        else _seed_kahan(lib, out["long_buf"], out["short_buf"], out["ratio_buf"])
    )
    return out


def init_host_carry(shape: fsm.FSMShape, params: fsm.FSMParams, b: int) -> dict:
    """Fresh host carry for B streams (fsm.init_carry numerics)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native FSM decoder unavailable (g++/make missing?)")
    L, S, R = shape.long_window, shape.short_window, shape.ratio_window
    init_avg = _param_vec(params.initial_long_term_avg, b, np.float32)
    if shape.has_initial_avg:
        long_buf = np.ones((b, L), np.float32) * init_avg[:, None]
        long_cnt = np.full((b,), L, np.int32)
        long_last = init_avg.copy()
    else:
        long_buf = np.zeros((b, L), np.float32)
        long_cnt = np.zeros((b,), np.int32)
        long_last = np.zeros((b,), np.float32)
    zi = lambda: np.zeros((b,), np.int32)
    zf = lambda: np.zeros((b,), np.float32)
    carry = {
        "long_buf": long_buf,
        "long_idx": zi(),
        "long_cnt": long_cnt,
        "long_last": long_last,
        "short_buf": np.zeros((b, S), np.float32),
        "short_idx": zi(),
        "short_cnt": zi(),
        "ratio_buf": np.zeros((b, R), np.float32),
        "ratio_idx": zi(),
        "ratio_cnt": zi(),
        "state": zi(),
        "start_win": zi(),
        "end_win": zi(),
        "seg_ratio_sum": zf(),
        "seg_ratio_cnt": zi(),
        "met_sec": zf(),
    }
    carry["_kahan"] = _seed_kahan(
        lib, carry["long_buf"], carry["short_buf"], carry["ratio_buf"]
    )
    return carry


def tile_param_rows(params: fsm.FSMParams, b: int) -> fsm.FSMParams:
    """(stream, machine) rows, b-major: tile [K] param leaves to [B*K]
    (row r = stream * K + machine, matching the slab runner's alt layout)."""
    return fsm.FSMParams(*[np.tile(np.asarray(leaf), b) for leaf in params])


def scan_windows_host(
    shape: fsm.FSMShape,
    params: fsm.FSMParams,
    min_volumes,  # [B, W] f32 (jax or numpy; fetched via np.asarray)
    volume_ratios,  # [B, W]
    valids,  # [B, W] bool
    carry: dict[str, Any] | None = None,  # host carry (or fsm-style; converted)
    win_base=None,  # [B] i32 first-window indices
    return_carry: bool = False,
):
    """Run the FSM window scan on the host via the native decoder.

    Drop-in for ``fsm_pallas.scan_windows_pallas``: same FSMParams
    broadcasting (scalars shared, [B] vectors per-stream), same carry
    chaining semantics.  Returns a numpy ``fsm.WindowOutput`` (and the
    updated host carry when ``return_carry``); the carry is mutated in
    place when it is already a host carry.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native FSM decoder unavailable (g++/make missing?)")
    mv = np.ascontiguousarray(np.asarray(min_volumes), np.float32)
    vr = np.ascontiguousarray(np.asarray(volume_ratios), np.float32)
    va = np.ascontiguousarray(np.asarray(valids), np.uint8)
    b, w = mv.shape
    if carry is None:
        carry = init_host_carry(shape, params, b)
    elif "_kahan" not in carry or not isinstance(carry["long_buf"], np.ndarray):
        carry = host_carry(shape, carry)
    if win_base is None:
        wb = np.zeros((b,), np.int32)
    else:
        wb = np.ascontiguousarray(np.asarray(win_base), np.int32)

    # The native decoder strides raw pointers by these shapes — validate
    # everything handed to C against a corrupt/stale carry (e.g. a
    # checkpoint from a different config) or mismatched inputs.
    if vr.shape != (b, w) or va.shape != (b, w):
        raise ValueError(
            f"volume_ratios/valids shapes {vr.shape}/{va.shape} != min_volumes "
            f"{(b, w)}"
        )
    if wb.shape != (b,):
        raise ValueError(f"win_base shape {wb.shape} != ({b},)")
    if carry["_kahan"].shape != (b, NK):
        raise ValueError(
            f"carry['_kahan'] shape {carry['_kahan'].shape} != ({b}, {NK})"
        )
    for name, ring, limit in (
        ("long", carry["long_buf"], shape.long_window),
        ("short", carry["short_buf"], shape.short_window),
        ("ratio", carry["ratio_buf"], shape.ratio_window),
    ):
        if ring.shape != (b, limit):
            raise ValueError(
                f"carry[{name}_buf] shape {ring.shape} != ({b}, {limit}) — "
                "carry does not match this FSMShape / batch"
            )
        idx = np.asarray(carry[f"{name}_idx"])
        if idx.shape != (b,) or (idx.size and (idx.min() < 0 or idx.max() >= limit)):
            raise ValueError(
                f"carry[{name}_idx] invalid for ring size {limit} "
                f"(shape {idx.shape}, range "
                f"[{idx.min() if idx.size else 0}, {idx.max() if idx.size else 0}])"
            )
    ireg = np.stack(
        [
            carry["long_idx"], carry["long_cnt"], carry["short_idx"],
            carry["short_cnt"], carry["ratio_idx"], carry["ratio_cnt"],
            carry["state"], carry["start_win"], carry["end_win"],
            carry["seg_ratio_cnt"],
        ],
        axis=-1,
    ).astype(np.int32)
    ireg = np.ascontiguousarray(ireg)
    freg = np.ascontiguousarray(
        np.stack(
            [carry["long_last"], carry["seg_ratio_sum"], carry["met_sec"]], axis=-1
        ).astype(np.float32)
    )

    event = np.empty((b, w), np.int32)
    event_win = np.empty((b, w), np.int32)
    seg_valid = np.empty((b, w), np.uint8)
    seg_start = np.empty((b, w), np.int32)
    seg_end = np.empty((b, w), np.int32)
    seg_ratio = np.empty((b, w), np.float32)
    seg_met = np.empty((b, w), np.float32)

    lib.fvad_fsm_scan(
        b, w,
        shape.long_window, shape.short_window, shape.ratio_window,
        1 if shape.has_initial_avg else 0, shape.fft_size, shape.sample_rate,
        np.float32(shape.window_sec),
        _param_vec(params.threshold_factor, b, np.float32),
        _param_vec(params.ratio_threshold, b, np.float32),
        _param_vec(params.min_consecutive_samples, b, np.int32),
        _param_vec(params.max_gap_samples, b, np.int32),
        _param_vec(params.min_duration_sec, b, np.float32),
        mv, vr, va, wb,
        carry["long_buf"], carry["short_buf"], carry["ratio_buf"],
        ireg, freg, carry["_kahan"],
        event, event_win, seg_valid, seg_start, seg_end, seg_ratio, seg_met,
    )

    names = (
        "long_idx", "long_cnt", "short_idx", "short_cnt", "ratio_idx",
        "ratio_cnt", "state", "start_win", "end_win", "seg_ratio_cnt",
    )
    for i, name in enumerate(names):
        carry[name] = ireg[:, i].copy()
    carry["long_last"] = freg[:, 0].copy()
    carry["seg_ratio_sum"] = freg[:, 1].copy()
    carry["met_sec"] = freg[:, 2].copy()

    win_out = fsm.WindowOutput(
        event=event,
        event_win=event_win,
        seg_valid=seg_valid.astype(bool),
        seg_start_win=seg_start,
        seg_end_win=seg_end,
        seg_ratio=seg_ratio,
        seg_met_sec=seg_met,
    )
    if return_carry:
        return win_out, carry
    return win_out
