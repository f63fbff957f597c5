"""Int8-quantized NSNet2 — a MEASURED-LOSING opt-in tier, kept for parity
with hardware/stacks where int8 pays (it does not on this one).

Final round-3 verdict (ROOFLINE.md "Dead end: int8" has the full table):
every int8 formulation loses the full serving tick to bf16 on this
v5e/XLA stack — this per-gate form x0.79 at B=13,824 (220.1 vs 174.5 ms
float), the fused/routed forms x0.33 (530.6 ms), Pallas-everywhere
x0.43 at B=4,096 — even though STANDALONE the fused int8 contraction
measures 2.4-2.95x faster than bf16 at dense row counts
(benchmarks/int8_dot_probe.py; ops/matmul_q8.py holds the fused-dequant
Pallas kernel that wins bare-op). In-scan, int8 dots run ~7-8 TFLOP/s
regardless of formulation: bare-op rates do not survive the scan
context. This file therefore ships the LEAST-BAD measured form — the v1
per-gate int32-accumulate layout — not the bare-op-optimal one.

Scheme (symmetric, zero-point-free — TPU MXU has no asymmetric path):

* Weights: per-output-column int8, ``s_w = max|col| / 127``, quantized at
  trace time (hoisted by XLA out of the serving step's scan).
* Out-of-scan activations (features, the GRU-1 input projection's input,
  the FF head's ReLU outputs): dynamic per-frame scales — one max-abs
  over the last axis, outside the recurrence.
* In-scan activations (h1, h2, and h1 as GRU-2's input): STATIC scale 127.
  The GRU hidden state is bounded by gate algebra — ``h' = (1-z)n + zh``
  with ``n = tanh(.) in [-1, 1]`` and ``h0 = 0`` gives ``|h| <= 1`` for
  every reachable state — so the recurrence needs NO per-step max
  reductions, only a round+clip+cast of 400 lanes per row (``clip``
  guards tanh saturating to exactly 1.0). The 1/127 factor is folded
  into the weight scales.
* Accumulation in int32 (exact: worst case 400 * 127 * 127 << 2^31),
  dequantized to f32 for the gate math — so quantized results are
  bit-identical across backends and batch shapes.

NOT a parity mode: int8 carries ~2 decimal digits, so the gain mask
deviates ~1e-2 and VAD decisions can shift near thresholds (measured
like the bf16 tier — benchmarks/precision_sweep.py int8 row: 0 segment
deviations on the synthetic corpus; the decision chain itself — band
sums, RMS volumes, FSM — stays f32 regardless, pipeline/vad.py).

Reference semantics being approximated: NSNet2.zig:53-112 (the f32 ONNX
Runtime run); gate order and linear_before_reset=1 as in nsnet2.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import precision as _prec
from . import nsnet2

_F32 = jnp.float32


def _dot8(qa, qb):
    """[..., K] int8 @ [K, N] int8 -> [..., N] int32 (MXU int8 path)."""
    return jax.lax.dot_general(
        qa, qb, (((qa.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


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


def _qgru(g: nsnet2.GRUParams):
    """Quantize one GRU layer per gate: (wi3, wh3, bi3, bh3) where each w3
    entry is (q [in, 400], scale-with-1/127-folded [1, 400]). The z|r|n
    gate layout has ONE definition — nsnet2._split_gru3."""
    wi3, wh3, bi3, bh3 = nsnet2._split_gru3(g)
    return (
        tuple(_qw_static(w) for w in wi3),
        tuple(_qw_static(w) for w in wh3),
        tuple(b.astype(_F32) for b in bi3),
        tuple(b.astype(_F32) for b in bh3),
    )


def _proj_static(qh, w3, b3):
    """Per-gate projections of a statically-quantized activation."""
    return tuple(
        _dot8(qh, q).astype(_F32) * s + b for (q, s), b in zip(w3, b3)
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
    wi1, wh1, bi1, bh1 = _qgru(g1)
    wi2, wh2, bi2, bh2 = _qgru(g2)

    # Front matmuls over the whole sequence (outside the recurrence).
    qx, sx = _qa_dyn(features)
    x = _dot8(qx, qfc).astype(_F32) * sx * sfc + fcb  # [..., T, 400]
    qx1, sx1 = _qa_dyn(x)
    gi1 = tuple(
        jnp.moveaxis(
            (_dot8(qx1, q).astype(_F32) * (sx1 * np.float32(127.0)) * s + b)
            .astype(act),
            -2, 0,
        )
        for (q, s), b in zip(wi1, bi1)
    )  # 3 x [T, ..., 400] (wi1 scales carry the folded 1/127; undo it — the
    #    input here is dynamically scaled, not the static in-scan form)

    state = tuple(h.astype(_F32) for h in state)

    def step(carry, gi1_i):
        h1, h2 = carry  # f32; gate math stays f32 (VPU-native)
        gh1 = _proj_static(_qa_static(h1), wh1, bh1)
        h1 = nsnet2._gates_split3(
            tuple(g.astype(_F32) for g in gi1_i), gh1, h1
        )
        gi2 = _proj_static(_qa_static(h1), wi2, bi2)
        gh2 = _proj_static(_qa_static(h2), wh2, bh2)
        h2 = nsnet2._gates_split3(gi2, gh2, h2)
        return (h1, h2), h2.astype(act)

    (h1, h2), ys = jax.lax.scan(step, state, gi1, unroll=nsnet2._GRU_UNROLL)
    if out_frames is not None and out_frames < t:
        ys = ys[t - out_frames:]
    y = jnp.moveaxis(ys, 0, -2)  # [..., T_out, 400]

    # FF head: y = GRU output is gate-bounded -> static; ReLU outputs are
    # unbounded -> dynamic per-frame scales.
    qw1, sw1 = _qw_static(params.ff1_w)
    a = jax.nn.relu(
        _dot8(_qa_static(y), qw1).astype(_F32) * sw1
        + params.ff1_b.astype(_F32)
    )
    qw2, sw2 = _qw(params.ff2_w)
    qa2, sa2 = _qa_dyn(a)
    a = jax.nn.relu(
        _dot8(qa2, qw2).astype(_F32) * sa2 * sw2 + params.ff2_b.astype(_F32)
    )
    qw3, sw3 = _qw(params.out_w)
    qa3, sa3 = _qa_dyn(a)
    gains = jax.nn.sigmoid(
        _dot8(qa3, qw3).astype(_F32) * sa3 * sw3 + params.out_b.astype(_F32)
    )
    return (h1.astype(state_dtype), h2.astype(state_dtype)), gains.astype(act)
