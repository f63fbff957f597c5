"""Int8-quantized NSNet2: every model matmul as an int8 MXU contraction.

A throughput tier for dense online serving (``FVAD_QUANT=int8`` /
``precision.set_quant("int8")``). The serving tick at B >= ~10k streams is
MXU-throughput bound at ~25% of the bf16 peak (ROOFLINE.md "online tick"),
and the measured int8 mechanism on v5e (benchmarks/int8_dot_probe.py) is:

* the FUSED [R, 400] @ [400, 1200] contraction runs 1.72x faster than
  bf16 in int8 (15.05 vs 8.73 TFLOP/s) — the int8 MXU rate is real;
* the per-gate [400, 400] shape is SLOWER in int8 than bf16 (layout);
* XLA lowers the int32 -> f32 * scale dequant as a second HBM pass that
  erases the entire win.

So this model uses the fused projections everywhere and routes every
matmul through ``ops.matmul_q8.dot_q8`` — a Pallas kernel that keeps the
int32 accumulator in VMEM and applies the per-column (and optional
per-row) scales in the epilogue, with a bitwise-identical XLA fallback
(int8 x int8 accumulation is exact in int32, so backend choice can never
change results).

This is NOT a parity mode: int8 carries ~2 decimal digits, so the gain
mask deviates ~1e-2 and VAD decisions can shift near thresholds (measured
with the same corpus methodology as the bf16 tier —
``benchmarks/precision_sweep.py``; the decision chain itself — band sums,
RMS volumes, FSM — stays f32 regardless, pipeline/vad.py).

Scheme (symmetric, zero-point-free — TPU MXU has no asymmetric path):

* Weights: per-output-column int8, ``s_w = max|col| / 127``, quantized at
  trace time (hoisted by XLA out of the serving step's scan; recomputing
  per call costs a few M VPU ops against a multi-TFLOP tick).
* Out-of-scan activations (features, the GRU-1 input projection's input,
  the FF head's ReLU outputs): dynamic per-frame scales — one max-abs
  over the last axis, outside the recurrence, applied as the kernel's
  row_scale.
* In-scan activations (h1, h2, and h1 as GRU-2's input): STATIC scale 127.
  The GRU hidden state is bounded by gate algebra — ``h' = (1-z)n + zh``
  with ``n = tanh(.) in [-1, 1]`` and ``h0 = 0`` gives ``|h| <= 1`` for
  every reachable state — so the recurrence needs NO per-step max
  reductions, only a round+clip+cast of 400 lanes per row. (``clip``
  guards the one representable boundary case: tanh saturating to 1.0.)
  The 1/127 factor is folded into the weight scales.
* Accumulation in int32 (exact: worst case 400 * 127 * 127 << 2^31),
  dequantized to f32 for the gate math.

Reference semantics being approximated: NSNet2.zig:53-112 (the f32 ONNX
Runtime run); gate order and linear_before_reset=1 as in nsnet2.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import precision as _prec
from ..ops.matmul_q8 import dot_q8
from . import nsnet2

_F32 = jnp.float32


def _qw(w):
    """Per-output-column symmetric int8 weight quant -> (q, scale [1, N])."""
    w = w.astype(_F32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    s = jnp.maximum(amax, np.float32(1e-20)) / np.float32(127.0)
    q = jnp.round(w / s).astype(jnp.int8)
    return q, s


def _qw_static(w):
    """Weight quant with the static activation scale 1/127 pre-folded in."""
    q, s = _qw(w)
    return q, s / np.float32(127.0)


def _qa_dyn(x):
    """Dynamic per-row (last-axis) activation quant -> (q, scale [..., 1])."""
    x = x.astype(_F32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, np.float32(1e-20)) / np.float32(127.0)
    q = jnp.round(x / s).astype(jnp.int8)
    return q, s


def _qa_static(h):
    """Static-scale quant for gate-bounded activations (|h| <= 1)."""
    return (
        jnp.clip(jnp.round(h.astype(_F32) * np.float32(127.0)), -127.0, 127.0)
        .astype(jnp.int8)
    )


def apply_streaming_q8(
    params: nsnet2.NSNet2Params, state, features, out_frames=None
):
    """Int8 mirror of ``nsnet2.apply_streaming``'s plain path (lbr=1 only;
    the caller routes rider/defer_head/wavefront to the f32/bf16 paths).

    Returns (new_state, gains) with the same dtypes as the plain path under
    the active io policy: state in the caller's dtype, gains/scan storage
    in ``precision.io_dtype()`` (or f32)."""
    g1, g2 = params.gru1, params.gru2
    assert g1.linear_before_reset and g2.linear_before_reset
    t = features.shape[-2]
    state_dtype = state[0].dtype
    act = _prec.io_dtype() or _F32  # storage dtype for the big scan xs/ys

    qfc, sfc = _qw(params.fc_in_w)
    fcb = params.fc_in_b.astype(_F32)
    qwi1, swi1 = _qw(g1.wi)
    qwh1, swh1 = _qw_static(g1.wh)
    qwi2, swi2 = _qw_static(g2.wi)
    qwh2, swh2 = _qw_static(g2.wh)
    bi1 = g1.bi.astype(_F32)
    bh1 = g1.bh.astype(_F32)
    bi2 = g2.bi.astype(_F32)
    bh2 = g2.bh.astype(_F32)

    # Front matmuls over the whole sequence (outside the recurrence).
    qx, sx = _qa_dyn(features)
    x = dot_q8(qx, qfc, sfc, row_scale=sx) + fcb  # [..., T, 400] f32
    qx1, sx1 = _qa_dyn(x)
    gi1 = (dot_q8(qx1, qwi1, swi1, row_scale=sx1) + bi1).astype(act)
    gi1_t = jnp.moveaxis(gi1, -2, 0)  # [T, ..., 1200]

    state = tuple(h.astype(_F32) for h in state)

    def step(carry, gi1_i):
        h1, h2 = carry  # f32; gate math stays f32 (VPU-native)
        gh1 = dot_q8(_qa_static(h1), qwh1, swh1) + bh1
        h1 = nsnet2._gates_lbr(gi1_i.astype(_F32), gh1, h1)
        gi2 = dot_q8(_qa_static(h1), qwi2, swi2) + bi2
        gh2 = dot_q8(_qa_static(h2), qwh2, swh2) + bh2
        h2 = nsnet2._gates_lbr(gi2, gh2, h2)
        return (h1, h2), h2.astype(act)

    (h1, h2), ys = jax.lax.scan(step, state, gi1_t, unroll=nsnet2._GRU_UNROLL)
    if out_frames is not None and out_frames < t:
        ys = ys[t - out_frames:]
    y = jnp.moveaxis(ys, 0, -2)  # [..., T_out, 400]

    # FF head: y = GRU output is gate-bounded -> static; ReLU outputs are
    # unbounded -> dynamic per-frame scales.
    qw1, sw1 = _qw_static(params.ff1_w)
    a = jax.nn.relu(
        dot_q8(_qa_static(y), qw1, sw1) + params.ff1_b.astype(_F32)
    )
    qw2, sw2 = _qw(params.ff2_w)
    qa2, sa2 = _qa_dyn(a)
    a = jax.nn.relu(
        dot_q8(qa2, qw2, sw2, row_scale=sa2) + params.ff2_b.astype(_F32)
    )
    qw3, sw3 = _qw(params.out_w)
    qa3, sa3 = _qa_dyn(a)
    gains = jax.nn.sigmoid(
        dot_q8(qa3, qw3, sw3, row_scale=sa3) + params.out_b.astype(_F32)
    )
    return (h1.astype(state_dtype), h2.astype(state_dtype)), gains.astype(act)
