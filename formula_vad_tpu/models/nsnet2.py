"""NSNet2 noise-suppression network, implemented natively in JAX.

The reference executes ``data/nsnet2-20ms-baseline.onnx`` through ONNX
Runtime's C API (``src/NSNet2.zig:53-112,220``); here the network is a pure
JAX function whose recurrence runs under ``jax.lax.scan`` so it fuses into
the surrounding pipeline and batches over (stream, channel) on TPU.

Architecture (the public Microsoft DNS-Challenge NSNet2 baseline,
"Data augmentation and loss normalization for deep noise suppression",
Braun & Tashev 2020):

    input [*, T, 161] log-power spectrum
    -> Dense 161->400
    -> GRU 400->400
    -> GRU 400->400
    -> Dense 400->600 + ReLU
    -> Dense 600->600 + ReLU
    -> Dense 600->161 + sigmoid     (spectral gain mask in (0, 1))

Weights can be loaded from the original ONNX file via
``formula_vad_tpu.models.onnx_import`` (the reference repo's copy is an
absent LFS blob, so random-init and ``.npz`` paths are also provided).

Important parity detail: the reference performs a *stateless* ONNX Runtime
run per 0.5 s chunk — the GRU starts from h=0 every chunk and is warmed up
by 4 carried-over context frames (``artifact_mitigation_window``,
NSNet2.zig:16,186-203).  ``apply`` therefore always scans from zero state;
an explicitly-carried variant (``apply_streaming``) is provided for the
low-latency 20 ms-hop mode (BASELINE.json config 4).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

N_BINS = 161
HIDDEN = 400
FF1 = 600
FF2 = 600

from ..ops.precision import matmul_precision


def _dense(x, w, b, stage=None):
    # `stage` routes through the per-stage precision override map
    # (ops/precision.py STAGES) — the parity-fast audit lever.
    return jnp.matmul(x, w, precision=matmul_precision(stage)) + b


@dataclasses.dataclass(frozen=True)
class GRUParams:
    """Single-layer GRU weights, PyTorch/ONNX gate order (z, r, n).

    wi: [in, 3*hidden]   input kernel  (columns ordered z | r | n)
    wh: [hidden, 3*hidden] recurrent kernel
    bi: [3*hidden]       input bias
    bh: [3*hidden]       recurrent bias
    linear_before_reset: ONNX GRU attribute; PyTorch exports use 1:
      n = tanh(Wn x + bWn + r * (Rn h + bRn))
    """

    wi: Any
    wh: Any
    bi: Any
    bh: Any
    linear_before_reset: int = 1


def gru_cell(p: GRUParams, h, x):
    """One GRU step. x: [..., in], h: [..., hidden] -> h'."""
    return gru_cell_pre(p, h, _dense(x, p.wi, p.bi, stage="gru_i"))


def gru_cell_pre(p: GRUParams, h, gi):
    """GRU step with the input projection precomputed (gi = x @ wi + bi).

    Hoisting the input projection out of the time scan turns T tiny matmuls
    into one MXU-shaped [.., T, in] @ [in, 3H] matmul (done by the caller).
    """
    if p.linear_before_reset:
        return _gates_lbr(gi, _dense(h, p.wh, p.bh, stage="gru_h"), h)
    z_i, r_i, n_i = jnp.split(gi, 3, axis=-1)
    wh_z, wh_r, wh_n = jnp.split(p.wh, 3, axis=-1)
    bh_z, bh_r, bh_n = jnp.split(p.bh, 3, axis=-1)
    z = jax.nn.sigmoid(z_i + jnp.matmul(h, wh_z, precision=matmul_precision("gru_h")) + bh_z)
    r = jax.nn.sigmoid(r_i + jnp.matmul(h, wh_r, precision=matmul_precision("gru_h")) + bh_r)
    n = jnp.tanh(n_i + jnp.matmul(r * h, wh_n, precision=matmul_precision("gru_h")) + bh_n)
    return (1.0 - z) * n + z * h


@dataclasses.dataclass(frozen=True)
class NSNet2Params:
    fc_in_w: Any  # [161, 400]
    fc_in_b: Any  # [400]
    gru1: GRUParams
    gru2: GRUParams
    ff1_w: Any  # [400, 600]
    ff1_b: Any
    ff2_w: Any  # [600, 600]
    ff2_b: Any
    out_w: Any  # [600, 161]
    out_b: Any


jax.tree_util.register_dataclass(
    GRUParams,
    data_fields=["wi", "wh", "bi", "bh"],
    meta_fields=["linear_before_reset"],
)
jax.tree_util.register_dataclass(
    NSNet2Params,
    data_fields=[
        "fc_in_w", "fc_in_b", "gru1", "gru2",
        "ff1_w", "ff1_b", "ff2_w", "ff2_b", "out_w", "out_b",
    ],
    meta_fields=[],
)


def init_params(key: jax.Array, dtype=jnp.float32) -> NSNet2Params:
    """Random (Glorot-uniform) initialization — used when no trained weights
    are available (the reference repo's ONNX blob is an absent LFS object,
    /root/reference/.MISSING_LARGE_BLOBS:1) and for training from scratch."""
    ks = jax.random.split(key, 16)

    def glorot(k, shape):
        fan_in, fan_out = shape[0], shape[-1]
        lim = np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(k, shape, dtype, -lim, lim)

    def gru(k1, k2, k3, k4, in_dim):
        return GRUParams(
            wi=glorot(k1, (in_dim, 3 * HIDDEN)),
            wh=glorot(k2, (HIDDEN, 3 * HIDDEN)),
            bi=jnp.zeros((3 * HIDDEN,), dtype),
            bh=jnp.zeros((3 * HIDDEN,), dtype),
        )

    return NSNet2Params(
        fc_in_w=glorot(ks[0], (N_BINS, HIDDEN)),
        fc_in_b=jnp.zeros((HIDDEN,), dtype),
        gru1=gru(ks[1], ks[2], ks[3], ks[4], HIDDEN),
        gru2=gru(ks[5], ks[6], ks[7], ks[8], HIDDEN),
        ff1_w=glorot(ks[9], (HIDDEN, FF1)),
        ff1_b=jnp.zeros((FF1,), dtype),
        ff2_w=glorot(ks[10], (FF1, FF2)),
        ff2_b=jnp.zeros((FF2,), dtype),
        out_w=glorot(ks[11], (FF2, N_BINS)),
        out_b=jnp.zeros((N_BINS,), dtype),
    )


def zero_state(batch_shape=(), dtype=jnp.float32):
    return (
        jnp.zeros(batch_shape + (HIDDEN,), dtype),
        jnp.zeros(batch_shape + (HIDDEN,), dtype),
    )


def _gates_lbr(gi, gh, h):
    """GRU gate math with both projections precomputed (linear_before_reset=1):
    gi = x @ wi + bi, gh = h @ wh + bh."""
    z_i, r_i, n_i = jnp.split(gi, 3, axis=-1)
    z_h, r_h, n_h = jnp.split(gh, 3, axis=-1)
    z = jax.nn.sigmoid(z_i + z_h)
    r = jax.nn.sigmoid(r_i + r_h)
    n = jnp.tanh(n_i + r * n_h)
    return (1.0 - z) * n + z * h


# --- split3: per-gate GRU matmuls (lane-aligned gate outputs) ---------------
#
# HIDDEN=400 is not a lane multiple (400 != k*128), so the fused [400, 1200]
# projections force 400/800-boundary slicing of every gate tensor — inside
# the scan, every step. Computing each gate's projection as its own
# [400, 400] matmul leaves outputs natively gate-aligned with no slicing
# anywhere. Measured on chip (benchmarks/gru_pad_exp.py 2026-08-19,
# interleaved): the full model stage wins 7.5% at bf16 (all 3 reps, gate
# vs plain BITWISE), +2.5% at highest (all 3 reps, also BITWISE on chip),
# ties at bf16_io (gate 3.9e-3 — per-gate activations round to bf16
# storage separately there). On XLA:CPU the split is ~1-ulp off the fused
# form at every level (dot N-tiling changes — PARITY.md dev. 13 class),
# which is where the parity/fuzz suites run, so default "auto" enables it
# only at DEFAULT matmul precision (the bf16/bf16_io production modes);
# the parity tiers keep the fused program (the highest-tier +2.5% is left
# on the table for cross-backend bitwise parity; FVAD_GRU_SPLIT3=on takes
# it explicitly). The whpad/kpad512 padding variants LOSE at every mode —
# measured dead ends (same log).
# The opt-in rider/deep/wavefront paths always pin the fused form — their
# bitwise gates compare against plain chains, so both sides must run one
# program (the same reason those paths pin predecim off).

_SPLIT3_ENV = os.environ.get("FVAD_GRU_SPLIT3", "auto").lower()
if _SPLIT3_ENV not in ("auto", "on", "off"):
    raise ValueError(
        f"FVAD_GRU_SPLIT3 must be 'auto', 'on' or 'off', got {_SPLIT3_ENV!r}"
    )
_SPLIT3 = _SPLIT3_ENV


def set_gru_split3(mode: str | None) -> None:
    """Override the split3 mode at trace time ('auto'|'on'|'off');
    ``None`` restores the FVAD_GRU_SPLIT3 env default."""
    global _SPLIT3
    if mode is not None and mode not in ("auto", "on", "off"):
        raise ValueError(f"split3 mode must be 'auto', 'on' or 'off', got {mode!r}")
    _SPLIT3 = _SPLIT3_ENV if mode is None else mode


def _split3_enabled() -> bool:
    if _SPLIT3 == "on":
        return True
    if _SPLIT3 == "off":
        return False
    return matmul_precision() in (None, jax.lax.Precision.DEFAULT)


# --- scan unroll: amortize the recurrence's per-iteration loop overhead ---
#
# `lax.scan(..., unroll=u)` stitches u iteration bodies into one loop body:
# the ops and their order are UNCHANGED (bitwise — a pure loop transform),
# but XLA schedules a u-step window at once, overlapping iteration t's VPU
# gate math with t+1's carry-independent work and paying the loop-bookkeeping
# cost 1/u as often. Applies to the production layer-by-layer scans only
# (split3 and fused); the rider/deep/wavefront opt-ins keep unroll=1 — their
# A/B gates compare against plain chains traced at the shipping default.
_GRU_UNROLL_ENV = int(os.environ.get("FVAD_GRU_UNROLL", "1"))
if _GRU_UNROLL_ENV < 1:
    raise ValueError(
        f"FVAD_GRU_UNROLL must be a positive integer, got {_GRU_UNROLL_ENV}"
    )
_GRU_UNROLL = _GRU_UNROLL_ENV


def set_gru_unroll(u: int | None) -> None:
    """Override the scan unroll factor at trace time; ``None`` restores the
    FVAD_GRU_UNROLL env default."""
    global _GRU_UNROLL
    if u is not None and u < 1:
        raise ValueError(f"unroll must be a positive integer, got {u}")
    _GRU_UNROLL = _GRU_UNROLL_ENV if u is None else int(u)


def _split_gru3(g: GRUParams):
    """(wi[in,3H], wh[H,3H], bi, bh) -> per-gate triples (z, r, n each)."""
    return (
        tuple(jnp.split(g.wi, 3, axis=-1)),
        tuple(jnp.split(g.wh, 3, axis=-1)),
        tuple(jnp.split(g.bi, 3)),
        tuple(jnp.split(g.bh, 3)),
    )


def _proj3(h, w3, b3, stage=None):
    return tuple(_dense(h, w, b, stage=stage) for w, b in zip(w3, b3))


def _gates_split3(gi3, gh3, h):
    """_gates_lbr with the projections arriving per-gate (no slicing)."""
    (z_i, r_i, n_i), (z_h, r_h, n_h) = gi3, gh3
    z = jax.nn.sigmoid(z_i + z_h)
    r = jax.nn.sigmoid(r_i + r_h)
    n = jnp.tanh(n_i + r * n_h)
    return (1.0 - z) * n + z * h


def apply_streaming(
    params: NSNet2Params,
    state,
    features: jnp.ndarray,
    out_frames: int | None = None,
    rider=None,
    defer_head: bool = False,
):
    """Run the network over a feature sequence with explicit GRU state.

    Args:
      params: weights.
      state: (h1, h2) each [..., 400].
      features: [..., T, 161] log-power features, time axis second-to-last.
      out_frames: if set, return gains only for the LAST out_frames frames
        (bit-identical to slicing afterwards, but the post-GRU dense stack
        skips the dropped frames — the 4 warm-up context frames in the
        chunked denoiser, NSNet2.zig:16,186-203).
      rider: optional ``(fn, xs)`` — independent per-step work fed THROUGH
        the time scan so the TensorCore's static scheduler can issue its
        MXU dots while the VPU retires the GRU gate math (the recurrence is
        the step's latency-bound stage, ROOFLINE.md §"Why not higher MFU?").
        ``xs`` is a pytree whose leaves have leading axis T; iteration i
        additionally computes ``fn(xs[i])`` and the stacked outputs are
        returned as a third element. The GRU math is unchanged — the rider
        is data-independent of the recurrence by construction (used for the
        NEXT slab's stft matmul in the cross-slab pipelined offline path).
    Returns:
      (new_state, gains [..., T_out, 161]) — plus stacked rider outputs
      when ``rider`` is given; with ``defer_head`` the gains slot holds the
      raw GRU outputs [..., T_out, 400] instead (run ``apply_head`` later).

    The time recurrence is a ``lax.scan``; the pointwise dense layers before
    and after the GRUs are applied to the whole sequence at once so they run
    as large MXU matmuls rather than per-step ops.

    An alternative *wavefront* schedule is available via
    FVAD_GRU_WAVEFRONT=on: scan iteration i computes layer-1 step i and
    layer-2 step i-1, so the three recurrent projections (h1 @ wh1,
    h1 @ wi2, h2 @ wh2) have no data dependence within an iteration and the
    per-iteration dependency chain is one matmul round instead of three.
    Measured on one v5e chip it cuts the online 0.5 s chunk step (2 rows)
    from 1.09 to 0.84 ms, but costs ~3-4% on the MXU-throughput-bound
    1680-row offline batch — and the 0.5 s cadence leaves 500 ms of budget,
    so the layer-by-layer schedule is the default everywhere. (The 20 ms
    low-latency mode scans T=1 frames, where the schedules coincide.)
    Whichever schedule is selected applies at every batch size, so numerics
    never depend on how audio is batched; the schedules agree to <=1 ulp
    (moving ops across the scan boundary can change XLA's FMA formation —
    same deviation class as PARITY.md #3/#4; asserted at 1e-6 in
    tests/test_nsnet2.py). Weights with linear_before_reset=0 always use
    the layer-by-layer form.
    """
    t = features.shape[-2]
    if t == 0:  # nothing to scan: state unchanged, empty gains
        assert rider is None and not defer_head
        return state, jnp.zeros(features.shape[:-1] + (N_BINS,), features.dtype)
    from ..ops import precision as _prec

    if (
        _prec.quant_int8()
        and rider is None
        and not defer_head
        and bool(params.gru1.linear_before_reset and params.gru2.linear_before_reset)
        and os.environ.get("FVAD_GRU_WAVEFRONT", "off") != "on"
    ):
        # Int8 serving tier (precision.set_quant): every model matmul as an
        # int8 MXU contraction — models/nsnet2_q8.py. The rider/defer/
        # wavefront opt-ins and lbr=0 weights keep the float paths (their
        # bitwise A/B gates pin float programs).
        from . import nsnet2_q8

        return nsnet2_q8.apply_streaming_q8(params, state, features, out_frames)

    io = _prec.io_dtype()
    state_dtype = state[0].dtype
    if io is not None:
        # bf16 activation storage (precision.set_io_dtype): weights, features
        # and the GRU state all compute in bf16 — at matmul precision
        # ``default`` the MXU reads bf16 operands anyway, so this only drops
        # storage bytes, not MXU input mantissa. State is cast back to the
        # caller's dtype on return (it may live in an f32 scan carry).
        features = _prec.io_cast(features)
        params = jax.tree_util.tree_map(_prec.io_cast, params)
        state = jax.tree_util.tree_map(_prec.io_cast, state)
    g1, g2 = params.gru1, params.gru2
    x = _dense(features, params.fc_in_w, params.fc_in_b, stage="fc_in")  # [..., T, 400]

    wavefront = bool(g1.linear_before_reset and g2.linear_before_reset)
    if os.environ.get("FVAD_GRU_WAVEFRONT", "off") != "on":
        wavefront = False

    # Per-gate matmuls (no 400-boundary slicing) in the plain layer-by-layer
    # path at the precisions where they measure faster; the rider/deep/
    # wavefront opt-ins pin the fused form (see the split3 block above).
    split3 = (
        _split3_enabled()
        and not wavefront
        and rider is None
        and not defer_head
        and bool(g1.linear_before_reset and g2.linear_before_reset)
    )
    if split3:
        wi1_3, wh1_3, bi1_3, bh1_3 = _split_gru3(g1)
        wi2_3, wh2_3, bi2_3, bh2_3 = _split_gru3(g2)
        # GRU1's input projections over the whole sequence: three big
        # matmuls, each gate's output natively aligned.
        gi1_t = tuple(
            jnp.moveaxis(_dense(x, w, b, stage="gru_i"), -2, 0)
            for w, b in zip(wi1_3, bi1_3)
        )  # 3 x [T, ..., 400]

        def step3(carry, gi1_i):
            h1, h2 = carry
            h1 = _gates_split3(gi1_i, _proj3(h1, wh1_3, bh1_3, stage="gru_h"), h1)
            h2 = _gates_split3(
                _proj3(h1, wi2_3, bi2_3, stage="gru_i"),
                _proj3(h2, wh2_3, bh2_3, stage="gru_h"),
                h2,
            )
            return (h1, h2), h2

        (h1, h2), ys = jax.lax.scan(step3, state, gi1_t, unroll=_GRU_UNROLL)
        if out_frames is not None and out_frames < t:
            ys = ys[t - out_frames :]
        y = jnp.moveaxis(ys, 0, -2)  # [..., T_out, 400]
        gains = apply_head(params, y)
        if io is not None and state_dtype != io:
            h1, h2 = h1.astype(state_dtype), h2.astype(state_dtype)
        return (h1, h2), gains

    # GRU1's input projection over the whole sequence: one big matmul.
    gi1 = _dense(x, params.gru1.wi, params.gru1.bi, stage="gru_i")  # [..., T, 1200]
    # scan over time: move T to the front.
    gi1_t = jnp.moveaxis(gi1, -2, 0)  # [T, ..., 1200]

    if wavefront:
        # A rider composes with the wavefront schedule too: slices 0..T-2
        # ride the T-1-iteration scan, the final slice runs in the epilogue
        # — so schedule choice stays independent of pipelining (the GRU math
        # is bitwise the riderless wavefront either way).
        rider_fn, rider_xs = rider if rider is not None else (None, None)
        h1, h2 = state
        # Prologue: layer-1 step 0 (layer 2 has nothing to do yet).
        h1 = _gates_lbr(gi1_t[0], _dense(h1, g1.wh, g1.bh, stage="gru_h"), h1)

        # The three projections use exactly the same [.., 400] @ [400, 1200]
        # contractions as the layer-by-layer form (no stacking/concat, whose
        # blocking can differ by 1 ulp on some backends) — only the schedule
        # changes, so outputs stay bitwise identical.
        def step(carry, xs_i):
            gi1_i, rx_i = xs_i if rider is not None else (xs_i, None)
            h1, h2 = carry  # h1 = h1[i-1], h2 = h2[i-2]
            gh1 = _dense(h1, g1.wh, g1.bh, stage="gru_h")
            gi2 = _dense(h1, g2.wi, g2.bi, stage="gru_i")
            gh2 = _dense(h2, g2.wh, g2.bh, stage="gru_h")
            h1n = _gates_lbr(gi1_i, gh1, h1)
            h2n = _gates_lbr(gi2, gh2, h2)  # = h2[i-1]
            out = h2n if rider is None else (h2n, rider_fn(rx_i))
            return (h1n, h2n), out

        tmap = jax.tree_util.tree_map
        if rider is not None:
            head = tmap(lambda x: x[:-1], rider_xs)
            (h1, h2), (ys, rider_head) = jax.lax.scan(
                step, (h1, h2), (gi1_t[1:], head)
            )
        else:
            (h1, h2), ys = jax.lax.scan(step, (h1, h2), gi1_t[1:])
        # Epilogue: layer-2 step T-1 (+ the rider's final slice).
        h2 = _gates_lbr(
            _dense(h1, g2.wi, g2.bi, stage="gru_i"),
            _dense(h2, g2.wh, g2.bh, stage="gru_h"),
            h2,
        )
        ys = jnp.concatenate([ys, h2[None]], axis=0)  # [T, ..., 400]
        if rider is not None:
            last = rider_fn(tmap(lambda x: x[-1], rider_xs))
            rider_ys = tmap(
                lambda a, b: jnp.concatenate([a, b[None]], axis=0),
                rider_head, last,
            )
    elif rider is not None:
        rider_fn, rider_xs = rider

        def step(carry, xs_i):
            gi1_i, rx_i = xs_i
            h1, h2 = carry
            h1 = gru_cell_pre(params.gru1, h1, gi1_i)
            h2 = gru_cell(params.gru2, h2, h1)
            # Independent of the carry: lands in the loop-body schedule
            # alongside the gate math (MXU fills while the VPU chains).
            return (h1, h2), (h2, rider_fn(rx_i))

        (h1, h2), (ys, rider_ys) = jax.lax.scan(step, state, (gi1_t, rider_xs))
    else:  # throughput regime (large batch) or linear_before_reset=0 weights

        def step(carry, gi1_i):
            h1, h2 = carry
            h1 = gru_cell_pre(params.gru1, h1, gi1_i)
            h2 = gru_cell(params.gru2, h2, h1)
            return (h1, h2), h2

        (h1, h2), ys = jax.lax.scan(step, state, gi1_t, unroll=_GRU_UNROLL)
    if out_frames is not None and out_frames < t:
        ys = ys[t - out_frames :]
    y = jnp.moveaxis(ys, 0, -2)  # [..., T_out, 400]
    # defer_head: return the raw GRU outputs; the caller runs apply_head
    # later (the deep-pipelined offline path rides it through the NEXT
    # slab's scan — row-parallel, so slicing commutes with it).
    gains = y if defer_head else apply_head(params, y)
    if io is not None and state_dtype != io:
        h1, h2 = h1.astype(state_dtype), h2.astype(state_dtype)
    if rider is not None:
        return (h1, h2), gains, rider_ys
    return (h1, h2), gains


def apply_head(params: NSNet2Params, y: jnp.ndarray) -> jnp.ndarray:
    """Post-GRU dense stack: [..., 400] -> gains [..., 161].

    Row-parallel (no time coupling) — the single definition shared by the
    immediate path and the deferred/ridden path, so both compute the exact
    same ops. Callers deferring the head must pass the SAME (possibly
    io_cast) params and ys dtype apply_streaming would have used."""
    y = jax.nn.relu(_dense(y, params.ff1_w, params.ff1_b, stage="ff"))
    y = jax.nn.relu(_dense(y, params.ff2_w, params.ff2_b, stage="ff"))
    return jax.nn.sigmoid(_dense(y, params.out_w, params.out_b, stage="ff"))


def apply(
    params: NSNet2Params,
    features: jnp.ndarray,
    out_frames: int | None = None,
    rider=None,
    defer_head: bool = False,
):
    """Stateless run from h=0 (matches ONNX Runtime per-chunk semantics).

    features: [..., T, 161] -> gains [..., T_out, 161] (see apply_streaming's
    out_frames for the T_out != T case; with ``rider`` returns
    (gains, rider_out); with ``defer_head`` the raw GRU outputs
    [..., T_out, 400] replace gains — run ``apply_head`` later).
    """
    batch_shape = features.shape[:-2]
    # Derive the zero state from the features so it inherits their sharding
    # varying-axes under shard_map (a plain jnp.zeros constant is "unvarying"
    # and fails scan's carry type check inside manual-sharding regions).
    zero = jnp.zeros(batch_shape + (HIDDEN,), features.dtype)
    zero = zero + 0.0 * features[..., 0, 0][..., None]
    out = apply_streaming(
        params, (zero, zero), features, out_frames, rider=rider,
        defer_head=defer_head,
    )
    if rider is not None:
        _, gains, rider_ys = out
        return gains, rider_ys
    _, gains = out
    return gains


# ---------------------------------------------------------------------------
# Weight (de)serialization
# ---------------------------------------------------------------------------


def save_npz(path: str, params: NSNet2Params, dtype=None) -> None:
    """Save weights as .npz; dtype=np.float16 halves the file (inference
    upcasts to f32 on load — a storage codec, not a compute precision)."""
    flat = {
        "fc_in_w": params.fc_in_w, "fc_in_b": params.fc_in_b,
        "ff1_w": params.ff1_w, "ff1_b": params.ff1_b,
        "ff2_w": params.ff2_w, "ff2_b": params.ff2_b,
        "out_w": params.out_w, "out_b": params.out_b,
    }
    for name, g in (("gru1", params.gru1), ("gru2", params.gru2)):
        flat[f"{name}_wi"] = g.wi
        flat[f"{name}_wh"] = g.wh
        flat[f"{name}_bi"] = g.bi
        flat[f"{name}_bh"] = g.bh
    flat = {k: np.asarray(v) for k, v in flat.items()}
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    for name, g in (("gru1", params.gru1), ("gru2", params.gru2)):
        flat[f"{name}_lbr"] = np.int32(g.linear_before_reset)
    np.savez_compressed(path, **flat)


def load_npz(path: str) -> NSNet2Params:
    z = np.load(path)

    def arr(key):
        a = z[key]
        # f16-stored weights (see save_npz) are upcast for f32 compute.
        return jnp.asarray(a.astype(np.float32) if a.dtype == np.float16 else a)

    def gru(name):
        return GRUParams(
            wi=arr(f"{name}_wi"),
            wh=arr(f"{name}_wh"),
            bi=arr(f"{name}_bi"),
            bh=arr(f"{name}_bh"),
            linear_before_reset=int(z[f"{name}_lbr"]),
        )

    return NSNet2Params(
        fc_in_w=arr("fc_in_w"), fc_in_b=arr("fc_in_b"),
        gru1=gru("gru1"), gru2=gru("gru2"),
        ff1_w=arr("ff1_w"), ff1_b=arr("ff1_b"),
        ff2_w=arr("ff2_w"), ff2_b=arr("ff2_b"),
        out_w=arr("out_w"), out_b=arr("out_b"),
    )


def load(path: str | None, *, seed: int = 0) -> NSNet2Params:
    """Load weights from .onnx / .npz, or random-init when path is None."""
    if path is None:
        return init_params(jax.random.PRNGKey(seed))
    if path.endswith(".npz"):
        return load_npz(path)
    if path.endswith(".onnx"):
        from . import onnx_import

        return onnx_import.load_nsnet2_onnx(path)
    raise ValueError(f"unsupported NSNet2 weight format: {path}")
