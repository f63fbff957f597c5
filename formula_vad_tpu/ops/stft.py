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

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import dft
from .precision import io_cast, matmul_precision


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Slice ``x[..., T]`` into overlapping frames [..., n_frames, n_fft].

    n_frames = (T - n_fft) // hop + 1 (no padding).

    For the 50%-overlap case (hop == n_fft/2, the NSNet2 layout) the frames
    are built from two shifted reshapes instead of a gather — XLA lowers
    large gathers to slow scalar loops on TPU, while reshape+concat is pure
    data movement.
    """
    t = x.shape[-1]
    n_frames = (t - n_fft) // hop + 1
    if n_fft == 2 * hop and t % hop == 0:
        segs = x.reshape(x.shape[:-1] + (t // hop, hop))
        first = segs[..., :-1, :]
        second = segs[..., 1:, :]
        return jnp.concatenate([first, second], axis=-1)[..., :n_frames, :]
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    window: np.ndarray,
    n_fft: int,
    hop: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed forward STFT: x[..., T] -> (re, im) each [..., n_frames, n_bins]."""
    return stft_frames(frame_signal(x, n_fft, hop), window, n_fft)


def stft_frames(
    frames: jnp.ndarray, window: np.ndarray, n_fft: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed forward DFT on pre-gathered frames [..., n_fft]."""
    return dft.rdft(frames * jnp.asarray(window), n_fft)


@functools.lru_cache(maxsize=None)
def _segmat_basis(window_key: int, n_fft: int, decimate: int) -> np.ndarray:
    """Combined (decimate + window + rDFT) basis for the half-overlap STFT.

    For hop = n_fft/2, frame f = [seg_f | seg_{f+1}] where seg_s is the s-th
    non-overlapping hop-sized block. The windowed rDFT then splits into two
    matmuls on the segment tensor:
        X[f] = seg_f @ T + seg_{f+1} @ B
    with T/B the window-scaled top/bottom halves of the DFT basis. With
    decimation folded in, the basis rows live at 48 kHz stride so the matmul
    consumes the raw audio directly — no strided slice, no frame gather, no
    intermediate 2x-sized frame tensor. Output columns: [re | im] x [T | B].
    """
    window = _SEGMAT_WINDOWS[window_key]
    cos_m, sin_m = dft.rdft_matrices(n_fft)
    hop = n_fft // 2
    n_bins = n_fft // 2 + 1
    wc = window[:, None] * cos_m
    ws = window[:, None] * sin_m
    top = np.concatenate([wc[:hop], ws[:hop]], axis=1)  # [hop, 2*bins]
    bot = np.concatenate([wc[hop:], ws[hop:]], axis=1)
    basis = np.zeros((hop * decimate, 4 * n_bins), np.float32)
    basis[0::decimate, : 2 * n_bins] = top
    basis[0::decimate, 2 * n_bins :] = bot
    return basis


_SEGMAT_WINDOWS: dict[int, np.ndarray] = {}


def segmat_basis_arr(window: np.ndarray, n_fft: int, decimate: int) -> jnp.ndarray:
    """The combined segment basis as a device constant (shared by
    ``stft_segmat`` and the cross-slab pipelined rider, which computes the
    same matmul in row slices fed through the GRU scan)."""
    key = hash(window.tobytes())
    _SEGMAT_WINDOWS[key] = np.asarray(window, np.float32)
    return jnp.asarray(_segmat_basis(key, n_fft, decimate))


@functools.lru_cache(maxsize=None)
def _decim_sel(hop: int, decimate: int) -> np.ndarray:
    """0/1 selection matrix [hop*decimate, hop]: column k picks 48 kHz sample
    k*decimate of a raw segment — decimation expressed as a dense matmul.

    The selection itself is exact at every precision (each output is one
    1.0*x plus +0.0 terms), and the composite predecim product performs
    1/decimate of the fused basis's MXU work (the fused [hop*d, 4*bins]
    basis is 2/3 structurally-zero rows at d=3 — the measured
    13%-of-roofline stage). vs the fused basis the composite is
    bitwise on XLA:CPU but ~1 ulp off on the MXU (reduction-tree leaf
    positions shift with the zero rows) — PARITY.md deviation 13."""
    sel = np.zeros((hop * decimate, hop), np.float32)
    sel[np.arange(hop) * decimate, np.arange(hop)] = 1.0
    return sel


def decim_sel_arr(hop: int, decimate: int) -> jnp.ndarray:
    return jnp.asarray(_decim_sel(hop, decimate))


@functools.lru_cache(maxsize=None)
def _segmat_basis_padded(window_key: int, n_fft: int) -> np.ndarray:
    """Dense (decimate=1) segment basis with its columns EXPLICITLY
    zero-padded to the next multiple of 128 lanes (644 -> 768).

    Measured (benchmarks/stft_layout_exp.py, on chip 2026-08-19): the
    hand-padded matmul runs ~22% faster than XLA's implicit pad at
    highest/bf16 precision (neutral at bf16_io, where the op is
    HBM-bound). Bitwise-safe: zero basis columns cannot change the
    consumed columns' contractions; consumers slice [.., :4*n_bins]
    (segmat_spectra)."""
    base = _segmat_basis(window_key, n_fft, 1)
    n = base.shape[1]
    pad = (-n) % 128
    if pad == 0:
        return base
    return np.concatenate([base, np.zeros((base.shape[0], pad), base.dtype)], axis=1)


def segmat_basis_padded_arr(window: np.ndarray, n_fft: int) -> jnp.ndarray:
    key = hash(window.tobytes())
    _SEGMAT_WINDOWS[key] = np.asarray(window, np.float32)
    return jnp.asarray(_segmat_basis_padded(key, n_fft))


def segmat_segments(
    x: jnp.ndarray, seg: int, initial_segment: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Assemble the non-overlapping hop-segments [..., T/seg + 1, seg] that
    feed the segment-basis matmul (pure data movement, no compute).

    Reshape BEFORE concatenating: prepending along the segment (sublane)
    axis moves whole contiguous rows, while a flat lane-axis concat would
    shift every element by ``seg`` lanes — a full-array relayout that costs
    more than the matmul itself on TPU. Bit-identical either way."""
    t = x.shape[-1]
    assert t % seg == 0
    if initial_segment is None:
        initial_segment = jnp.zeros(x.shape[:-1] + (seg,), x.dtype)
    return jnp.concatenate(
        [
            initial_segment[..., None, :].astype(x.dtype),
            x.reshape(x.shape[:-1] + (t // seg, seg)),
        ],
        axis=-2,
    )


def segmat_spectra(
    prod: jnp.ndarray, n_fft: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Finish the segment-basis STFT from the raw matmul product
    [..., S+1, >=4*n_bins]: frame f = top half of segment f + bottom half
    of segment f+1 (the shift-add). Columns past 4*n_bins (the padded
    basis's zero lanes, ``_segmat_basis_padded``) are ignored."""
    n_bins = n_fft // 2 + 1
    z = prod[..., :-1, : 2 * n_bins] + prod[..., 1:, 2 * n_bins : 4 * n_bins]
    return z[..., :n_bins], z[..., n_bins : 2 * n_bins]


def stft_segmat(
    x: jnp.ndarray,
    window: np.ndarray,
    n_fft: int,
    decimate: int = 1,
    initial_segment: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Half-overlap windowed STFT as one big MXU matmul, with optional
    decimation folded into the basis.

    Args:
      x: [..., T] audio at the *input* rate; T must be a multiple of
        hop*decimate. The signal is prefixed with ``initial_segment``
        ([..., hop*decimate], default zeros — the streaming input-tail
        chain's zero init; pass the previous slab's final raw segment to
        continue a stream exactly).
    Returns:
      (re, im) each [..., T/(hop*decimate), n_bins]: frame f covers decimated
      samples [f*hop - hop, f*hop + hop).
    """
    hop = n_fft // 2
    basis = segmat_basis_arr(window, n_fft, decimate)
    segs = segmat_segments(x, hop * decimate, initial_segment)
    prod = jnp.matmul(io_cast(segs), io_cast(basis), precision=matmul_precision("stft"))
    return segmat_spectra(prod, n_fft)


@functools.lru_cache(maxsize=None)
def _inv_segmat_basis(window_key: int, n_fft: int) -> np.ndarray:
    """Inverse basis for ``istft_segmat``: [2*n_bins, n_fft] mapping
    [re | im] -> windowed time frame (kissfft 1/n_fft normalization folded),
    with columns [0:hop] the frame's top half, [hop:] the bottom half."""
    window = _SEGMAT_WINDOWS[window_key]
    cos_i, sin_i = dft.irdft_matrices(n_fft)
    scale = window.astype(np.float64) / n_fft
    top_bot = np.concatenate([cos_i * scale, -sin_i * scale], axis=0)  # [2*bins, n_fft]
    return top_bot.astype(np.float32)


# Explicit K+N lane padding of the inverse-basis matmul (default OFF).
# Bare-op story (benchmarks/tail_layout_exp.py, 2026-08-19, interleaved):
# the padded form wins 8 of 9 reps across highest/bf16/bf16_io and removes
# the op's 1.0-3.2 ms run-to-run tiling spread. But the FULL-STEP A/B
# (benchmarks/istft_ab.py, 2026-08-19, interleaved, bitwise gate max|d|=0
# at all modes) shows plain wins every rep of every mode — highest 30.94
# vs 31.38 ms, bf16 11.41 vs 11.59, bf16_io 9.53 vs 9.69: inside the real
# program XLA fuses the iSTFT product with its OLA consumers, and the
# explicit pad's extra concat/slice breaks that fusion for more than the
# tiling win. Dead end recorded in ROOFLINE.md; knob kept for re-testing
# on future XLA versions.
_ISTFT_PAD_ENV = os.environ.get("FVAD_ISTFT_PAD", "off").lower()
if _ISTFT_PAD_ENV not in ("on", "off"):
    raise ValueError(
        f"FVAD_ISTFT_PAD must be 'on' or 'off', got {_ISTFT_PAD_ENV!r}"
    )
_ISTFT_PAD = _ISTFT_PAD_ENV == "on"


def set_istft_pad(on: bool | None) -> None:
    """Override the istft lane-pad default at trace time; ``None`` restores
    the FVAD_ISTFT_PAD env default."""
    global _ISTFT_PAD
    _ISTFT_PAD = (_ISTFT_PAD_ENV == "on") if on is None else bool(on)


@functools.lru_cache(maxsize=None)
def _inv_segmat_basis_padded(window_key: int, n_fft: int) -> np.ndarray:
    """``_inv_segmat_basis`` with BOTH contraction dims explicitly padded to
    the next 128-lane multiple: K (2*n_bins = 322 -> 384) as zero rows, N
    (n_fft = 320 -> 384) as zero columns. See the FVAD_ISTFT_PAD note."""
    base = _inv_segmat_basis(window_key, n_fft)
    kp = (-base.shape[0]) % 128
    np_ = (-base.shape[1]) % 128
    if kp == 0 and np_ == 0:
        return base
    out = np.zeros((base.shape[0] + kp, base.shape[1] + np_), base.dtype)
    out[: base.shape[0], : base.shape[1]] = base
    return out


def istft_segmat(
    re: jnp.ndarray, im: jnp.ndarray, window: np.ndarray, n_fft: int
) -> jnp.ndarray:
    """Half-overlap windowed iSTFT+OLA as one MXU matmul plus a shift-add.

    Inverse of ``stft_segmat`` (without decimation): output stream segment s
    (hop samples) = top half of frame s + bottom half of frame s-1.
    Returns [..., (n_frames+1)*hop]: the final hop is the dangling OLA tail.
    """
    hop = n_fft // 2
    n_bins = n_fft // 2 + 1
    key = hash(window.tobytes())
    _SEGMAT_WINDOWS[key] = np.asarray(window, np.float32)
    z = jnp.concatenate([io_cast(re), io_cast(im)], axis=-1)  # [..., n_frames, 2*bins]
    if _ISTFT_PAD:
        inv = jnp.asarray(_inv_segmat_basis_padded(key, n_fft))
        kpad = inv.shape[0] - 2 * n_bins
        if kpad:
            z = jnp.concatenate(
                [z, jnp.zeros(z.shape[:-1] + (kpad,), z.dtype)], axis=-1
            )
        prod = jnp.matmul(z, io_cast(inv), precision=matmul_precision("istft"))
        prod = prod[..., :n_fft]  # drop the zero N lanes
    else:
        inv = jnp.asarray(_inv_segmat_basis(key, n_fft))
        prod = jnp.matmul(z, io_cast(inv), precision=matmul_precision("istft"))
    top = prod[..., :hop]
    bot = prod[..., hop:]
    lead = prod.shape[:-2]
    zero = jnp.zeros(lead + (1, hop), prod.dtype)
    segs = jnp.concatenate([top, zero], axis=-2) + jnp.concatenate([zero, bot], axis=-2)
    return segs.reshape(lead + (-1,))


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
    frames = frames * jnp.asarray(
        np.asarray(window) * np.float32(1.0 / n_fft), frames.dtype
    )
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
    re, im = dft.rdft(frames * jnp.asarray(window, frames.dtype), n_fft)
    return (
        dft.magnitude(re.astype(jnp.float32), im.astype(jnp.float32))
        * np.float32(norm_factor)
    )


@functools.lru_cache(maxsize=None)
def _band_basis(window_key: int, n_fft: int, min_bin: int, max_bin: int) -> np.ndarray:
    """Window-scaled DFT basis restricted to bins [min_bin, max_bin]:
    [n_fft, 2*n_band] with columns [re | im]."""
    window = _SEGMAT_WINDOWS[window_key]
    cos_m, sin_m = dft.rdft_matrices(n_fft)
    sel = slice(min_bin, max_bin + 1)
    return np.concatenate(
        [window[:, None] * cos_m[:, sel], window[:, None] * sin_m[:, sel]], axis=1
    ).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _band16_basis(
    window_key: int, n_fft: int, min_bin: int, max_bin: int, rate: int
) -> np.ndarray:
    """Upsample-folded band DFT basis: [n_fft + 1, rate * 2 * n_band].

    One "superframe" of ``n_fft`` consecutive 16 kHz samples (plus the one
    sample before it, the lerp carry) covers exactly ``rate`` adjacent
    n_fft-sample 48 kHz analysis windows. The lerp-upsample operator
    (resample.zig:32-65) is LINEAR, so it folds into the windowed band DFT:
    band volumes come straight off the 16 kHz denoiser output and the
    upsampled stream is never materialized on the scoring path (PARITY.md
    controlled deviation: values match upsample-then-DFT to ~1e-6 rel).
    Column blocks per window w in 0..rate-1: [re(n_band) | im(n_band)]."""
    return _band16_basis_f64(
        _SEGMAT_WINDOWS[window_key].astype(np.float64), n_fft, min_bin, max_bin, rate
    ).astype(np.float32)


def _band16_basis_f64(
    window: np.ndarray, n_fft: int, min_bin: int, max_bin: int, rate: int
) -> np.ndarray:
    """float64 core of ``_band16_basis`` (shared with the deeper spectra fold)."""
    n_band = max_bin - min_bin + 1
    # U: [rate*n_fft 48k samples, n_fft+1 = prev + 16k samples] lerp matrix.
    u = np.zeros((rate * n_fft, n_fft + 1))
    i = np.arange(n_fft)
    for j in range(rate):
        f = (j + 1) / rate
        rows = i * rate + j
        if j == rate - 1:
            u[rows, i + 1] = 1.0
        else:
            u[rows, i] = 1.0 - f
            u[rows, i + 1] = f
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(min_bin, max_bin + 1, dtype=np.float64)[None, :]
    phase = -2.0 * np.pi * n * k / n_fft
    wd = np.concatenate(
        [window[:, None] * np.cos(phase), window[:, None] * np.sin(phase)], axis=1
    )  # [n_fft, 2*n_band]
    blocks = []
    for w in range(rate):
        a = np.zeros((rate * n_fft, 2 * n_band))
        a[w * n_fft : (w + 1) * n_fft, :] = wd
        blocks.append(u.T @ a)
    return np.concatenate(blocks, axis=1)


def band_volume_16k(
    x16: jnp.ndarray,
    prev: jnp.ndarray,
    window: np.ndarray,
    n_fft: int,
    norm_factor: float,
    min_bin: int,
    max_bin: int,
    n_windows: int,
    rate: int = 3,
) -> jnp.ndarray:
    """Speech-band volumes of ``n_windows`` 48 kHz analysis windows computed
    directly from the 16 kHz denoiser output with the lerp upsample folded
    into the DFT basis (``_band16_basis``) — the offline/slab scoring paths'
    band stage, replacing materialize-upsample + 48 kHz frame DFT (~4 ms of
    the 21-stream bench call; paths that *emit* audio still upsample).

    Args:
      x16: [..., T16] denoised 16 kHz stream (a slab or whole stream).
      prev: [...] the 16 kHz sample immediately before ``x16`` (0 at stream
        start; the previous slab's final sample when chaining — slabs are
        lcm-aligned so superframes line up across slab boundaries).
      n_windows: number of 48 kHz windows to emit (tail windows padded with
        zeros are the caller's invalid region).
    Returns [..., n_windows]."""
    key = hash(np.asarray(window, np.float32).tobytes())
    _SEGMAT_WINDOWS[key] = np.asarray(window, np.float32)
    basis = jnp.asarray(_band16_basis(key, n_fft, min_bin, max_bin, rate))
    n_band = max_bin - min_bin + 1
    nsw = -(-n_windows // rate)
    need = nsw * n_fft
    t = x16.shape[-1]
    if t < need:
        x16 = jnp.pad(x16, [(0, 0)] * (x16.ndim - 1) + [(0, need - t)])
    # Superframes by pure reshape (a 1-element lane-axis prepend would
    # relayout the whole stream); the single carried prev sample per
    # superframe enters as a rank-1 term on the basis's prev row instead.
    main = io_cast(x16[..., :need].reshape(x16.shape[:-1] + (nsw, n_fft)))
    prevs = jnp.concatenate(
        [jnp.asarray(prev, main.dtype)[..., None], main[..., :-1, -1]], axis=-1
    )  # [..., nsw]: sample before each superframe
    basis = io_cast(basis)
    prod = (
        jnp.matmul(main, basis[1:], precision=matmul_precision("band"))
        + prevs[..., None] * basis[0]
    # FSM decisions compare band sums against thresholds: the reduction math
    # stays f32 even when activations are stored bf16 (precision.io_dtype).
    ).astype(jnp.float32)
    prod = prod.reshape(prod.shape[:-1] + (rate, 2, n_band))
    mags = jnp.sqrt(prod[..., 0, :] ** 2 + prod[..., 1, :] ** 2)
    band = jnp.sum(mags, axis=-1) * np.float32(norm_factor)  # [..., nsw, rate]
    band = band.reshape(band.shape[:-2] + (nsw * rate,))
    return band[..., :n_windows]


@functools.lru_cache(maxsize=None)
def _bandz_parts(
    den_key: int,
    band_key: int,
    n_fft_den: int,
    n_fft_band: int,
    min_bin: int,
    max_bin: int,
    rate: int,
):
    """Composite (iDFT + OLA + lerp upsample + window + band DFT) basis.

    ``band_volume_spec`` folds the whole post-gain scoring chain into one
    linear map from the gained NSNet2 spectra.  Let hop = n_fft_den/2 and
    blk = lcm(n_fft_band, hop) 16 kHz samples (5120 for the 320/1024
    defaults) — one "block" of spb = blk/n_fft_band superframes covers
    fpb = blk/hop OLA frames exactly, so the composite map is BLOCK-
    PERIODIC: a 1-D convolution over the frame axis with kernel
    R = fpb + 2 frames (each block's samples draw on its fpb frames plus
    the two preceding ones through the OLA bottom halves and the lerp
    prev-sample) and stride fpb.

    Returns (W float32 [R, 2*n_bins_den, spb*rate*2*n_band],
             band_blk float64 [blk + 1, same cols],
             splits) where band_blk maps the
    block's raw stream samples (row 0 = the sample *before* the block) to
    the block's band re/im columns — kept for the exact edge-correction
    terms (carried OLA tail, lerp prev sample, end-of-stream truncation).
    ``splits`` is the structured-sparse factorization of W: each superframe
    s only sees the ~(n_fft_band/hop + 2) kernel frames whose samples land
    in its span, so W is ~74% zeros — splits[s] = (r0, W[r0:r1, :, s-cols])
    with all rows outside [r0, r1) zero, and evaluating spb narrow convs
    instead of the dense one does ~3.4x fewer MXU FLOPs (which of the two
    the hardware prefers is an on-chip A/B, benchmarks/band_fold_ab.py).
    """
    den_win = _SEGMAT_WINDOWS[den_key].astype(np.float64)
    band_win = _SEGMAT_WINDOWS[band_key].astype(np.float64)
    hop = n_fft_den // 2
    nb_den = n_fft_den // 2 + 1
    blk = int(np.lcm(n_fft_band, hop))
    fpb = blk // hop
    spb = blk // n_fft_band
    n_band = max_bin - min_bin + 1
    ncols_sf = rate * 2 * n_band
    ncols = spb * ncols_sf

    # f64 inverse-DFT basis (the _inv_segmat_basis math): [2*nb_den, n_fft_den],
    # columns [0:hop] = frame top half, [hop:] = bottom half.
    k = np.arange(nb_den, dtype=np.float64)[:, None]
    n = np.arange(n_fft_den, dtype=np.float64)[None, :]
    phase = 2.0 * np.pi * k * n / n_fft_den
    w_k = np.full((nb_den, 1), 2.0)
    w_k[0, 0] = 1.0
    w_k[-1, 0] = 1.0
    scale = den_win / n_fft_den
    inv64 = np.concatenate(
        [(w_k * np.cos(phase)) * scale, -(w_k * np.sin(phase)) * scale], axis=0
    )

    # Block-lifted band basis: band_blk[j] = band columns of stream sample
    # j-1 of the block (j = 0 is the sample before the block — it is both
    # superframe 0's lerp prev row and, for j = s*n_fft_band with s > 0,
    # superframe s-1's final sample, hence the += overlap).
    band16 = _band16_basis_f64(band_win, n_fft_band, min_bin, max_bin, rate)
    band_blk = np.zeros((blk + 1, ncols))
    for s in range(spb):
        band_blk[s * n_fft_band : (s + 1) * n_fft_band + 1,
                 s * ncols_sf : (s + 1) * ncols_sf] += band16

    # OLA lift: stream sample t (block-local, j = t + 1) = prod[f0, t % hop]
    # + prod[f0 - 1, hop + t % hop] with f0 = t // hop; in kernel-row terms
    # (row r = frame fpb*b - 2 + r) each (r, c) prod entry lands on exactly
    # one block sample:  c < hop: j = (r-2)*hop + c + 1 ;
    #                    c >= hop: j = (r-1)*hop + (c-hop) + 1.
    R = fpb + 2
    r_idx = np.arange(R)[:, None]
    c_half = np.arange(hop)[None, :]
    j_top = (r_idx - 2) * hop + c_half + 1
    j_bot = (r_idx - 1) * hop + c_half + 1

    def gathered(j):
        ok = (j >= 0) & (j <= blk)
        out = band_blk[np.clip(j, 0, blk)]
        out[~ok] = 0.0
        return out  # [R, hop, ncols]

    wp = np.concatenate([gathered(j_top), gathered(j_bot)], axis=1)  # [R, n_fft_den, ncols]
    w = np.einsum("zc,rcn->rzn", inv64, wp)  # [R, 2*nb_den, ncols]
    w32 = w.astype(np.float32)

    splits = []
    for s in range(spb):
        ws = w32[:, :, s * ncols_sf : (s + 1) * ncols_sf]
        nz = np.nonzero(np.abs(ws).max(axis=(1, 2)) > 0.0)[0]
        r0, r1 = int(nz[0]), int(nz[-1]) + 1
        splits.append((r0, ws[r0:r1]))
    return w32, band_blk, tuple(splits)


def band_spec_kernel_flops(
    den_window: np.ndarray,
    band_window: np.ndarray,
    n_fft_den: int,
    n_fft_band: int,
    min_bin: int,
    max_bin: int,
    rate: int,
    variant: str,
) -> int:
    """MXU FLOPs per output block of ``band_volume_spec``'s kernel form
    (multiply+add = 2), for bench.py's algorithmic accounting."""
    den_key = hash(np.asarray(den_window, np.float32).tobytes())
    _SEGMAT_WINDOWS[den_key] = np.asarray(den_window, np.float32)
    band_key = hash(np.asarray(band_window, np.float32).tobytes())
    _SEGMAT_WINDOWS[band_key] = np.asarray(band_window, np.float32)
    w, _, splits = _bandz_parts(
        den_key, band_key, n_fft_den, n_fft_band, min_bin, max_bin, rate
    )
    if variant == "split":
        return sum(2 * ws.shape[0] * ws.shape[1] * ws.shape[2] for _, ws in splits)
    return 2 * w.shape[0] * w.shape[1] * w.shape[2]


def band_volume_spec(
    re_g: jnp.ndarray,
    im_g: jnp.ndarray,
    prev16: jnp.ndarray,
    out_tail_prev: jnp.ndarray,
    den_window: np.ndarray,
    band_window: np.ndarray,
    n_fft_den: int,
    n_fft_band: int,
    norm_factor: float,
    min_bin: int,
    max_bin: int,
    n_windows: int,
    rate: int = 3,
    variant: str = "dense",
) -> jnp.ndarray:
    """Speech-band volumes straight from the GAINED SPECTRA: folds
    iSTFT + overlap-add + lerp upsample + band window + band DFT into one
    strided convolution, so the scoring path never materializes the
    denoised stream at ANY rate (one fold deeper than ``band_volume_16k``;
    the istft's [F, hop] -> flat stream relayout disappears with it).

    ``variant``: "dense" = one conv with the full [R, 2nb, ncols] kernel;
    "split" = one narrow conv per superframe phase using the kernel's
    structured sparsity (~3.4x fewer MXU FLOPs, spb dispatches; same
    operator, MXU-accumulation order differs within the tolerance class).

    Exact up to float reassociation: the folded map is the same linear
    operator, evaluated in different order (PARITY.md controlled-deviation
    class of #8; paths that must EMIT audio still run the real iSTFT).

    Args:
      re_g, im_g: [..., F, n_bins] gained spectra (re * g, im * g) of the
        slab's F OLA frames (frame f covers 16 kHz samples
        [f*hop - hop, f*hop + hop); the slab's stream is samples
        [0, F*hop)).
      prev16: [...] the 16 kHz sample before this slab (lerp carry).
      out_tail_prev: [..., hop] the previous slab's dangling OLA tail
        (added onto samples [0, hop)).
      n_windows: number of 48 kHz analysis windows to emit (the stream is
        zero-padded past F*hop exactly like ``band_volume_16k``).
    Returns [..., n_windows] float32.
    """
    hop = n_fft_den // 2
    den_key = hash(np.asarray(den_window, np.float32).tobytes())
    _SEGMAT_WINDOWS[den_key] = np.asarray(den_window, np.float32)
    band_key = hash(np.asarray(band_window, np.float32).tobytes())
    _SEGMAT_WINDOWS[band_key] = np.asarray(band_window, np.float32)
    w, band_blk, splits = _bandz_parts(
        den_key, band_key, n_fft_den, n_fft_band, min_bin, max_bin, rate
    )
    blk = int(np.lcm(n_fft_band, hop))
    fpb = blk // hop
    spb = blk // n_fft_band
    n_band = max_bin - min_bin + 1
    f = re_g.shape[-2]
    t16 = f * hop
    nsw = -(-n_windows // rate)
    # Cover BOTH the requested windows and the whole stream: a frame past
    # the last requested block still contributes (via its OLA top half) to
    # samples inside it, so never drop frames — emit extra blocks and
    # truncate the windows at the end instead.
    nblk = max(-(-nsw // spb), -(-f // fpb))
    lead = re_g.shape[:-2]

    z = jnp.concatenate([io_cast(re_g), io_cast(im_g)], axis=-1)  # [.., F, 2*nb]
    pad_f = nblk * fpb - f
    # 2 leading zero rows = frames -2, -1 (their true contributions enter
    # via the carry corrections below); trailing zero rows = the zero-padded
    # tail region past the stream end.
    zp = jnp.pad(z, [(0, 0)] * (z.ndim - 2) + [(2, pad_f), (0, 0)])
    zp_flat = zp.reshape((-1,) + zp.shape[-2:])

    def strided_conv(x, kern):
        return jax.lax.conv_general_dilated(
            x,
            io_cast(jnp.asarray(kern)),
            window_strides=(fpb,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=matmul_precision("band"),
        )

    if variant == "split":
        # One narrow conv per superframe phase: phase s's columns only see
        # kernel frames [r0, r0+Rs) (the rest of W's rows are exactly zero
        # there), so slice the input forward by r0 and convolve with the
        # nonzero rows. Output positions stay block-aligned: position b
        # reads frames b*fpb + r0 + [0, Rs), and r0 + Rs <= R guarantees
        # every s yields exactly nblk positions from the same zp.
        outs = [strided_conv(zp_flat[:, r0:, :], ws) for r0, ws in splits]
        assert all(o.shape[-2] == nblk for o in outs), (
            [o.shape for o in outs], nblk)
        out = jnp.concatenate(outs, axis=-1)
    else:
        out = strided_conv(zp_flat, w)
    band_ri = out.astype(jnp.float32).reshape(lead + out.shape[-2:])  # [.., nblk, ncols]

    # ---- exact edge corrections (all indices static under jit) ----------
    prec = matmul_precision("band")
    # (1) carry-in: sample -1 is prev16; samples [0, hop) additionally get
    # the previous slab's OLA tail.
    row_prev = jnp.asarray(band_blk[0].astype(np.float32))
    head = jnp.asarray(band_blk[1 : 1 + hop].astype(np.float32))
    c0 = prev16[..., None].astype(jnp.float32) * row_prev + jnp.matmul(
        out_tail_prev.astype(jnp.float32), head, precision=prec
    )
    band_ri = band_ri.at[..., 0, :].add(c0)
    # (2) end-of-stream truncation: the conv includes the final frame's OLA
    # bottom half at samples [t16, t16 + hop), but the scored stream is
    # zero there (band_volume_16k pads completed16 with zeros) — subtract
    # that dangling tail's contribution wherever those samples land.
    if t16 < nblk * blk:
        inv = jnp.asarray(_inv_segmat_basis(den_key, n_fft_den))  # [2nb, n_fft_den]
        z_last = z[..., f - 1, :].astype(jnp.float32)
        tail = jnp.matmul(z_last, inv[:, hop:], precision=prec)  # [.., hop]
        b_t = t16 // blk
        j0 = t16 - b_t * blk + 1  # block-local row of sample t16
        n1 = min(blk + 1 - j0, hop)
        if b_t < nblk and n1 > 0:
            rows = jnp.asarray(band_blk[j0 : j0 + n1].astype(np.float32))
            band_ri = band_ri.at[..., b_t, :].add(
                -jnp.matmul(tail[..., :n1], rows, precision=prec)
            )
        # Samples at/after the next block's prev row also appear there.
        spill_start = max(t16, (b_t + 1) * blk - 1)
        if b_t + 1 < nblk and spill_start < t16 + hop:
            off = spill_start - t16
            j1 = spill_start - (b_t + 1) * blk + 1  # 0 or positive
            n2 = hop - off
            rows = jnp.asarray(band_blk[j1 : j1 + n2].astype(np.float32))
            band_ri = band_ri.at[..., b_t + 1, :].add(
                -jnp.matmul(tail[..., off:], rows, precision=prec)
            )

    band_ri = band_ri.reshape(lead + (nblk, spb, rate, 2, n_band))
    mags = jnp.sqrt(band_ri[..., 0, :] ** 2 + band_ri[..., 1, :] ** 2)
    band = jnp.sum(mags, axis=-1) * np.float32(norm_factor)  # [.., nblk, spb, rate]
    band = band.reshape(lead + (nblk * spb * rate,))
    return band[..., :n_windows]


def band_volume_windows(
    frames: jnp.ndarray,
    window: np.ndarray,
    n_fft: int,
    norm_factor: float,
    min_bin: int,
    max_bin: int,
) -> jnp.ndarray:
    """Speech-band volume of non-overlapping windows: sum of normalized
    magnitudes over bins [min_bin, max_bin] (BufferedFFT.zig:183-202 via
    :162-181), computing the DFT only for the needed bins — for the default
    500-2000 Hz band that is 33 of 513 bins, a ~15x FLOP cut on the VAD's
    window stage.
    Returns [...] (frames' leading shape)."""
    key = hash(window.tobytes())
    _SEGMAT_WINDOWS[key] = np.asarray(window, np.float32)
    basis = jnp.asarray(_band_basis(key, n_fft, min_bin, max_bin))
    n_band = max_bin - min_bin + 1
    prod = jnp.matmul(
        io_cast(frames), io_cast(basis), precision=matmul_precision("band")
    ).astype(jnp.float32)  # decision-feeding reduction stays f32 (see band_volume_16k)
    mags = jnp.sqrt(prod[..., :n_band] ** 2 + prod[..., n_band:] ** 2)
    return jnp.sum(mags, axis=-1) * np.float32(norm_factor)
