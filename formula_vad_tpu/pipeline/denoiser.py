"""Streaming chunked NSNet2 denoiser as a pure scan step.

Re-expresses the reference's stateful per-channel denoise loop
(``src/NSNet2.zig:161-237`` + ``src/AudioPipeline/BufferedDenoiser.zig``)
as a pure function ``(carry, chunk) -> (carry, denoised)`` suitable for
``jax.lax.scan`` over time and ``vmap``/``shard_map`` over streams.

Per 0.5 s input chunk (24000 samples @48 kHz per channel) the reference:

1. decimates 48 k -> 16 k (8000 samples)                    (NSNet2.zig:205-209)
2. prepends the previous chunk's last 160 downsampled samples (:175-179,196)
3. takes 50 sqrt-Hann windowed 320-pt rFFT frames, hop 160  (:211-217)
4. features = log10(max(|X|^2, 1e-12))                      (:266-287)
5. prepends 4 carried feature frames and runs the network
   from zero GRU state over all 54 frames                   (:186-203,220)
6. applies the last 50 gain frames, clamped to [-80, 1]     (:289-310)
7. inverse FFT + windowed overlap-add; the first 160 output
   samples add onto the previous chunk's carried OLA tail   (:181-201,312-339)
8. lerp-upsamples the completed 8000 samples back to 24000,
   carrying the final input sample across chunks            (:230-236)

All channels (and, after vmap, all streams) are processed together: the
50-frame DFTs become one MXU matmul of shape [C*50, 320] @ [320, 161].
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..config import (
    NSNET2_CHUNK_16K,
    NSNET2_CONTEXT_FRAMES,
    NSNET2_N_BINS,
    NSNET2_N_FFT,
    NSNET2_N_FRAMES,
    NSNET2_N_HOP,
)
from ..models import nsnet2
from ..ops import resample, stft, windows

FEATURE_P_MIN = np.float32(1e-12)  # 10^-12 clamp (NSNet2.zig:275)
GAIN_MIN = np.float32(-80.0)  # (NSNet2.zig:295-296)
GAIN_MAX = np.float32(1.0)

_WINDOW = windows.sqrt_hann_symmetric(NSNET2_N_FFT)


def init_carry(n_channels: int, dtype=jnp.float32) -> dict[str, Any]:
    """Zero-initialized denoiser carry for one stream.

    Matches the reference's zero-filled buffers at init
    (NSNet2.zig:77-79,115-126).
    """
    return {
        "in_tail": jnp.zeros((n_channels, NSNET2_N_HOP), dtype),
        "out_tail": jnp.zeros((n_channels, NSNET2_N_HOP), dtype),
        "feat_ctx": jnp.zeros((n_channels, NSNET2_CONTEXT_FRAMES, NSNET2_N_BINS), dtype),
        "last_sample": jnp.zeros((n_channels,), dtype),
    }


def compute_features(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """log10 power spectrum, clamped at 1e-12 (NSNet2.zig:266-287)."""
    power = re * re + im * im
    return jnp.log10(jnp.maximum(power, FEATURE_P_MIN))


def denoise_chunk(
    params: nsnet2.NSNet2Params,
    carry: dict[str, Any],
    chunk48: jnp.ndarray,
    downsample_rate: int = 3,
) -> tuple[dict[str, Any], jnp.ndarray]:
    """Denoise one pipeline chunk.

    Args:
      carry: see ``init_carry``.
      chunk48: [n_channels, chunk_size] input audio at the pipeline rate
        (chunk_size = 8000 * downsample_rate).
    Returns:
      (new_carry, denoised [n_channels, chunk_size]).
    """
    n_ch = chunk48.shape[0]
    assert chunk48.shape[-1] == NSNET2_CHUNK_16K * downsample_rate

    # 48 k -> 16 k naive decimation (resample.zig:9-29).
    ds = resample.downsample(chunk48, downsample_rate)  # [C, 8000]

    # Overlap carry: previous chunk's last hop prefixes this chunk's input.
    audio_in = jnp.concatenate([carry["in_tail"], ds], axis=-1)  # [C, 8160]

    # 50 windowed rFFT frames per channel -> one batched MXU matmul.
    re, im = stft.stft(audio_in, _WINDOW, NSNET2_N_FFT, NSNET2_N_HOP)  # [C, 50, 161]

    feats = compute_features(re, im)
    # Cast the carried context at the join: carries stay f32 across chunks
    # (scan carry / checkpoint dtype stability) while activations may be
    # stored bf16 (precision.io_dtype).
    model_in = jnp.concatenate(
        [carry["feat_ctx"].astype(feats.dtype), feats], axis=-2
    )  # [C, 54, 161]

    # Stateless model run per chunk (zero GRU state for NSNet2 — ONNX
    # Runtime per-chunk semantics; see module docstring).
    from ..models.registry import apply_model

    gains = apply_model(params, model_in, out_frames=re.shape[-2])  # [C, 50, 161]
    g = jnp.clip(gains, GAIN_MIN, GAIN_MAX)

    # Apply gain and reconstruct; OLA folds window * 1/n_fft (NSNet2.zig:312-339).
    out_len = NSNET2_CHUNK_16K + NSNET2_N_HOP
    ola = stft.istft_overlap_add(re * g, im * g, _WINDOW, NSNET2_N_FFT, NSNET2_N_HOP, out_len)
    ola = ola.at[..., : NSNET2_N_HOP].add(carry["out_tail"].astype(ola.dtype))

    completed = ola[..., :NSNET2_CHUNK_16K]  # [C, 8000]

    # 16 k -> 48 k lerp upsample with carried last sample (resample.zig:32-65).
    up, new_last = resample.upsample(completed, carry["last_sample"], downsample_rate)

    cdt = carry["out_tail"].dtype
    new_carry = {
        "in_tail": ds[..., -NSNET2_N_HOP:].astype(carry["in_tail"].dtype),
        "out_tail": ola[..., NSNET2_CHUNK_16K:].astype(cdt),
        "feat_ctx": feats[..., -NSNET2_CONTEXT_FRAMES:, :].astype(cdt),
        "last_sample": new_last.astype(cdt),
    }
    return new_carry, up


assert NSNET2_N_FRAMES == 50
