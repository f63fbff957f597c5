"""GEMM-native real DFT / inverse real DFT.

TPU-first replacement for the reference's kissfft C library
(``src/FFT.zig:108-133`` wrapping ``kiss_fftr``/``kiss_fftri``):
instead of a scalar FFT per frame, all frames are expressed as one large
matrix multiply against precomputed DFT basis matrices, which maps the
work onto the MXU (128x128 systolic array).  For the small transform sizes
used here (320 and 1024 points) the GEMM formulation is far faster on TPU
than XLA's generic FFT lowering despite the higher FLOP count, and it
vectorizes trivially over (batch, channel, frame).

Conventions (matching kissfft):
* forward:  X[k] = sum_n x[n] * exp(-2i*pi*k*n/N),  k in [0, N/2]
* inverse:  ``irdft_kiss`` returns the *unnormalized* inverse like
  ``kiss_fftri`` (round-trip gains a factor of N); the reference multiplies
  by 1/N afterwards (NSNet2.zig:323), so callers here fold that in.

Matmuls are issued with ``precision=HIGHEST`` so the MXU uses full-f32
passes — required for parity with the CPU reference numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .precision import io_cast, matmul_precision


@functools.lru_cache(maxsize=None)
def rdft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis: returns (cos_mat, sin_mat), each [n_fft, n_bins].

    X_real = x @ cos_mat ; X_imag = x @ sin_mat (with the -2*pi*k*n/N phase).
    Computed in float64 then cast to float32 so basis error is sub-ulp.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    phase = -2.0 * np.pi * n * k / n_fft
    return np.cos(phase).astype(np.float32), np.sin(phase).astype(np.float32)


@functools.lru_cache(maxsize=None)
def irdft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT basis for the kissfft (unnormalized) convention.

    x_kiss[n] = sum_k w[k] * (Re X[k] cos(2 pi k n / N) - Im X[k] sin(2 pi k n / N))
    with w[k] = 1 for k in {0, N/2} and 2 otherwise; this equals N * ifft(x).
    Returns (cos_mat, sin_mat), each [n_bins, n_fft].
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    phase = 2.0 * np.pi * k * n / n_fft
    weights = np.full((n_bins, 1), 2.0)
    weights[0, 0] = 1.0
    weights[-1, 0] = 1.0
    cos_mat = (weights * np.cos(phase)).astype(np.float32)
    sin_mat = (weights * np.sin(phase)).astype(np.float32)
    return cos_mat, sin_mat


def rdft(frames: jnp.ndarray, n_fft: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward real DFT of ``frames[..., n_fft]`` -> (real, imag), each [..., n_bins]."""
    cos_mat, sin_mat = rdft_matrices(n_fft)
    frames = io_cast(frames)
    re = jnp.matmul(frames, io_cast(jnp.asarray(cos_mat)), precision=matmul_precision())
    im = jnp.matmul(frames, io_cast(jnp.asarray(sin_mat)), precision=matmul_precision())
    return re, im


def irdft_kiss(re: jnp.ndarray, im: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Unnormalized inverse real DFT (kiss_fftri convention): [..., n_bins] -> [..., n_fft]."""
    cos_mat, sin_mat = irdft_matrices(n_fft)
    x = jnp.matmul(
        io_cast(re), io_cast(jnp.asarray(cos_mat)), precision=matmul_precision()
    )
    x = x - jnp.matmul(
        io_cast(im), io_cast(jnp.asarray(sin_mat)), precision=matmul_precision()
    )
    return x


def magnitude(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """|X| = sqrt(re^2 + im^2) (FFT.zig:16-18)."""
    return jnp.sqrt(re * re + im * im)


def bin_count(n_fft: int) -> int:
    return n_fft // 2 + 1


def freq_to_bin(freq: float, n_fft: int, sample_rate: int) -> int:
    """Nearest-bin mapping (FFT.zig:156-166): round(freq / bin_width)."""
    bin_width = np.float32(sample_rate) / np.float32(n_fft)
    if freq > sample_rate / 2:
        raise ValueError("frequency above Nyquist")
    if freq < 0:
        raise ValueError("negative frequency")
    return int(np.round(np.float32(freq) / bin_width))
