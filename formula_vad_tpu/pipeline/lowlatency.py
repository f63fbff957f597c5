"""Low-latency online denoising: 20 ms frames, carried GRU state.

BASELINE.json config 4: "Streaming low-latency mode: chunked 20 ms hops with
carried GRU state (lax.scan online)".  Unlike the batch path — which
reproduces the reference's *stateless-per-0.5 s-chunk* ONNX semantics — this
mode runs the GRU as a true continuous recurrence with explicit state, so
the algorithmic latency is one 10 ms hop (+10 ms OLA lookahead) instead of
500 ms, at identical cost per sample.

State pytree: GRU hidden (h1, h2), the 160-sample input tail, the
160-sample OLA output tail, and the upsampler's carried last sample.
Use ``init_state`` / ``step`` for hop-by-hop streaming, or ``run`` to
process [.., T] audio as a ``lax.scan`` over hops.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NSNET2_N_FFT, NSNET2_N_HOP
from ..models import nsnet2
from ..ops import resample, stft
from . import denoiser as den_mod


def init_state(batch_shape=(), dtype=jnp.float32) -> dict[str, Any]:
    return {
        "gru": nsnet2.zero_state(batch_shape, dtype),
        "in_tail": jnp.zeros(batch_shape + (NSNET2_N_HOP,), dtype),
        "out_tail": jnp.zeros(batch_shape + (NSNET2_N_HOP,), dtype),
        "last_sample": jnp.zeros(batch_shape, dtype),
    }


def step(
    params: nsnet2.NSNet2Params,
    state: dict[str, Any],
    hop48: jnp.ndarray,
    downsample_rate: int = 3,
) -> tuple[dict[str, Any], jnp.ndarray]:
    """Process one 10 ms hop (480 samples @48 kHz per leading batch element).

    Args:
      hop48: [..., 480] input audio.
    Returns:
      (state', denoised [..., 480]) — the denoised output is delayed by one
      hop relative to the input (the OLA tail), like the chunk path.
    """
    assert hop48.shape[-1] == NSNET2_N_HOP * downsample_rate
    ds = resample.downsample(hop48, downsample_rate)  # [..., 160]
    frame = jnp.concatenate([state["in_tail"], ds], axis=-1)  # [..., 320]
    re, im = stft.stft_frames(frame[..., None, :], den_mod._WINDOW, NSNET2_N_FFT)
    feats = den_mod.compute_features(re, im)  # [..., 1, 161]
    gru_state, gains = nsnet2.apply_streaming(params, state["gru"], feats)
    g = jnp.clip(gains, den_mod.GAIN_MIN, den_mod.GAIN_MAX)
    # direct inverse of the single frame (no OLA buffer needed for one frame)
    from ..ops import dft

    frame_out = dft.irdft_kiss(re * g, im * g, NSNET2_N_FFT)[..., 0, :]
    frame_out = frame_out * (jnp.asarray(den_mod._WINDOW) * np.float32(1.0 / NSNET2_N_FFT))
    completed = state["out_tail"] + frame_out[..., :NSNET2_N_HOP]  # [..., 160]
    new_out_tail = frame_out[..., NSNET2_N_HOP:]
    up, new_last = resample.upsample(completed, state["last_sample"], downsample_rate)
    new_state = {
        "gru": gru_state,
        "in_tail": ds,
        "out_tail": new_out_tail,
        "last_sample": new_last,
    }
    return new_state, up


def run(
    params: nsnet2.NSNet2Params,
    audio: jnp.ndarray,
    state: dict[str, Any] | None = None,
    downsample_rate: int = 3,
):
    """Scan ``step`` over [..., T] audio (T a multiple of 480). Returns
    (final_state, denoised [..., T])."""
    hop = NSNET2_N_HOP * downsample_rate
    lead = audio.shape[:-1]
    t = audio.shape[-1]
    n = t // hop
    hops = audio[..., : n * hop].reshape(lead + (n, hop))
    hops = jnp.moveaxis(hops, -2, 0)  # [n, ..., hop]
    if state is None:
        state = init_state(lead, audio.dtype)

    def body(s, h):
        return step(params, s, h, downsample_rate)

    state, outs = jax.lax.scan(body, state, hops)
    return state, jnp.moveaxis(outs, 0, -2).reshape(lead + (n * hop,))
