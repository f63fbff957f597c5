"""STFT / iSTFT built on the GEMM-native DFT.

Replaces the reference's per-frame scalar loop over kissfft
(``src/NSNet2.zig:239-264`` calcSpectrogram, ``:312-339`` reconstructAudio,
``src/AudioPipeline/BufferedFFT.zig:162-181``) with batched tensor ops:
frames are gathered with one reshape/gather, windowed on the VPU, and
transformed with one MXU matmul for all frames at once.

The overlap-add inverse folds kissfft's missing 1/N normalization together
with the synthesis window exactly like NSNet2.zig:323-338 (window * 1/n_fft
applied to the unnormalized inverse), which nets out to
``irfft * window`` in standard-FFT terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import dft


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Slice ``x[..., T]`` into overlapping frames [..., n_frames, n_fft].

    n_frames = (T - n_fft) // hop + 1 (no padding).
    """
    t = x.shape[-1]
    n_frames = (t - n_fft) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    window: np.ndarray,
    n_fft: int,
    hop: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed forward STFT: x[..., T] -> (re, im) each [..., n_frames, n_bins]."""
    frames = frame_signal(x, n_fft, hop) * jnp.asarray(window)
    return dft.rdft(frames, n_fft)


def istft_overlap_add(
    re: jnp.ndarray,
    im: jnp.ndarray,
    window: np.ndarray,
    n_fft: int,
    hop: int,
    out_len: int,
) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add, kissfft normalization included.

    Args:
      re, im: [..., n_frames, n_bins] spectrum.
      out_len: length of the output buffer; frame f adds at offset f*hop.

    Matches NSNet2.zig reconstructAudio: each inverse frame is multiplied by
    ``window * (1/n_fft)`` (the 1/n_fft cancels kissfft's unnormalized
    inverse) and accumulated.
    """
    frames = dft.irdft_kiss(re, im, n_fft)  # [..., n_frames, n_fft]
    frames = frames * (jnp.asarray(window) * np.float32(1.0 / n_fft))
    n_frames = frames.shape[-2]

    # Overlap-add via segment-sum style scatter: with hop = n_fft/2 each output
    # sample receives at most 2 frame contributions; express OLA as the sum of
    # the even-frame and odd-frame streams, which XLA fuses into cheap
    # reshapes (no serial loop, no scatter).
    if n_fft == 2 * hop:
        lead = frames.shape[:-2]
        even = frames[..., 0::2, :].reshape(lead + (-1,))
        odd = frames[..., 1::2, :].reshape(lead + (-1,))
        out = jnp.zeros(lead + (out_len,), dtype=frames.dtype)
        out = out.at[..., : even.shape[-1]].add(even)
        out = out.at[..., hop : hop + odd.shape[-1]].add(odd)
        return out

    # General case: scatter-add per frame (still vectorized over frames).
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    out = jnp.zeros(frames.shape[:-2] + (out_len,), dtype=frames.dtype)
    return out.at[..., idx.reshape(-1)].add(frames.reshape(frames.shape[:-2] + (-1,)))


def magnitude_windows(
    frames: jnp.ndarray,
    window: np.ndarray,
    n_fft: int,
    norm_factor: float,
) -> jnp.ndarray:
    """Magnitude bins of non-overlapping analysis windows.

    Args:
      frames: [..., n_fft] windows (already gathered).
      norm_factor: windowNormFactor(window)/fft_size (BufferedFFT.zig:95-99);
        for the periodic Hann at 1024 this is 2/1024 = 1/512.
    Returns:
      [..., n_bins] magnitudes, |X| * norm_factor (BufferedFFT.zig:162-181).
    """
    re, im = dft.rdft(frames * jnp.asarray(window), n_fft)
    return dft.magnitude(re, im) * np.float32(norm_factor)
