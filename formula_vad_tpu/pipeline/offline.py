"""Offline (whole-stream) VAD path: chunk-parallel formulation.

The scan-based ``vad.process_stream`` mirrors the reference's streaming
recurrence chunk by chunk; its sequential depth is O(n_chunks * 54 GRU steps)
— fine for online latency, wasteful for offline batch scoring.

This module exploits a structural property of the reference pipeline
(SURVEY.md call stack 3.2): the NSNet2 ONNX session is run *statelessly* per
chunk (h0 = 0 every 0.5 s chunk, NSNet2.zig:220 — ONNX Runtime holds no GRU
state between runs), and every carried buffer in the chunk chain is a pure
function of the input audio or a strictly local overlap:

* the 160-sample input tail     -> global framing at hop 160 over the whole
                                   downsampled stream (zero-padded head)
* the 4-frame feature context   -> a gather of the previous chunk's feature
                                   rows from the global feature tensor
* the 160-sample OLA output tail-> global overlap-add over all frames (the
                                   per-chunk tail chaining IS the global OLA)
* the upsampler's last sample   -> a 1-sample shift of the global stream
* the 1024-pt window fill       -> global non-overlapping windowing

Therefore everything except the speech-state machine is computed for ALL
chunks at once: the GRU still scans its 54 frames, but batched over
(streams x channels x chunks) rows — turning tiny latency-bound matmuls
into MXU-shaped ones — and the only remaining sequential program is the
FSM scan over FFT windows (inherently serial: the long-term average
freezes on FSM decisions, VADMachine.zig:176-178).

Output is bit-identical to the scan path (asserted by tests): same frames,
same operations, same order within each frame — only the batching changes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
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
from ..ops import resample, stft, volume
from . import denoiser as den_mod
from . import fsm, vad


def band_composite_enabled() -> bool:
    """Whether the scoring band path uses the fully-folded spectra->band
    conv (``stft.band_volume_spec``, PARITY.md deviation 11) instead of
    the materialize-16k path (``band_volume_16k``, whose slab chaining is
    bitwise against the whole-stream run).

    ``FVAD_BAND_COMPOSITE``: ``on`` (dense kernel) | ``split`` (structured-
    sparse per-phase kernels) | ``off`` | ``auto`` (default = off).
    The on-chip three-way A/B (benchmarks/band_fold_ab.py, 2026-08-19,
    3 reps/mode) picked MATERIALIZE in every mode: highest 31.7 ms vs
    33.7/33.8 ms (composite/split), bf16 11.52 vs 11.58/11.80 ms, bf16_io
    10.03 vs 10.50/11.40 ms. The fold saves HBM traffic but loses the
    istft+band chain's higher-arithmetic-intensity matmul tiling; the
    strided conv's block-periodic kernel (lcm 5120) tiles poorly on the
    MXU. Recorded as a measured dead end in ROOFLINE.md; the fold stays
    available behind ``on``/``split`` for memory-bound regimes."""
    return _band_composite_mode() not in ("off", "auto")


_BAND_COMPOSITE_MODES = ("auto", "split", "on", "dense", "off")


def _band_composite_mode() -> str:
    v = os.environ.get("FVAD_BAND_COMPOSITE", "auto").lower()
    if v not in _BAND_COMPOSITE_MODES:
        # A kill-switch that silently ignores 'OFF'/'0'/'false' would leave
        # the deviation-11 path running while the operator believes it off.
        raise ValueError(
            f"FVAD_BAND_COMPOSITE must be one of {_BAND_COMPOSITE_MODES}, "
            f"got {v!r}"
        )
    return v


def band_composite_variant() -> str:
    """Kernel form for the composite band conv: "dense" | "split".
    ``split`` uses the FLOP-cheapest per-phase form (the CPU A/B winner);
    ``on``/``dense`` force the dense single-conv kernel. Only consulted
    when the composite path is enabled (not under the ``auto`` default)."""
    return "dense" if _band_composite_mode() in ("on", "dense") else "split"


def init_slab_carry(n_channels: int, downsample_rate: int = 3, dtype=jnp.float32):
    """Denoiser boundary state for slab-wise whole-stream processing.

    raw_tail carries the final hop of *raw* audio (the 16 kHz input tail is
    pure decimated input, so at 48 kHz it is just the last 480 samples);
    the rest mirror the streaming denoiser carry (denoiser.init_carry)."""
    return {
        "raw_tail": jnp.zeros((n_channels, NSNET2_N_HOP * downsample_rate), dtype),
        "feat_ctx": jnp.zeros((n_channels, NSNET2_CONTEXT_FRAMES, NSNET2_N_BINS), dtype),
        "out_tail": jnp.zeros((n_channels, NSNET2_N_HOP), dtype),
        "last_sample": jnp.zeros((n_channels,), dtype),
    }


# Trace-time toggle for the two-matmul decimating STFT (select-matmul
# decimation, then the dense hop-row basis) vs the single zero-stuffed
# fused basis. Default ON since the 2026-08-19 on-chip A/B
# (benchmarks/stft_ab.py: bare op −28% f32, full step wins at highest and
# bf16_io); ~1-ulp MXU reduction-tree reassociation vs fused — PARITY.md
# deviation 13 (FVAD_STFT_PREDECIM=off restores the fused basis).
# A kill-switch that silently ignored an unrecognized value would leave
# the operator believing the other program is running (same contract as
# FVAD_BAND_COMPOSITE's parser).
_PREDECIM_ENV = os.environ.get("FVAD_STFT_PREDECIM", "on").lower()
if _PREDECIM_ENV not in ("on", "off"):
    raise ValueError(
        f"FVAD_STFT_PREDECIM must be 'on' or 'off', got {_PREDECIM_ENV!r}"
    )
_PREDECIM = _PREDECIM_ENV == "on"


def stft_predecim_enabled() -> bool:
    """Current trace-time predecim default (bench.py's FLOP accounting
    follows the compiled program — STATUS round-3 item 8)."""
    return _PREDECIM


def set_stft_predecim(on: bool | None) -> None:
    """Override the predecim default at trace time; ``None`` restores the
    FVAD_STFT_PREDECIM env default."""
    global _PREDECIM
    _PREDECIM = (_PREDECIM_ENV == "on") if on is None else bool(on)


def segmat_prod(
    audio: jnp.ndarray,
    raw_tail: jnp.ndarray,
    downsample_rate: int = 3,
    predecim: bool | None = None,
):
    """The slab's raw segment-basis matmul product [..., S+1, 4*161]
    (stft_segmat before the shift-add) — the quantity the cross-slab
    pipelined path computes one slab ahead, inside the previous slab's GRU
    scan (``window_inputs_pipelined``).

    ``predecim=None`` follows the global default (PARITY.md deviation 13).
    The opt-in rider/deep paths pass ``False`` explicitly: their row-sliced
    in-scan program reproduces the FUSED basis matmul, and their bitwise
    gates compare against that premise — the two programs differ by ~1 ulp
    on the MXU (different reduction-tree leaf positions), so mixing them
    in one chain would fail the gates for a spurious reason."""
    from ..ops.precision import io_cast, matmul_precision

    if predecim is None:
        predecim = _PREDECIM
    seg48 = (NSNET2_N_FFT // 2) * downsample_rate
    if predecim and downsample_rate > 1:
        # Decimate FIRST with a 0/1 select matmul (exact), then run the
        # dense decimate=1 basis on hop-wide segments: 1/3 the fused
        # basis's MXU work and a 3x smaller segment intermediate. The
        # initial segment is prepended AFTER decimation so the concat
        # moves hop-wide rows.
        hop = NSNET2_N_FFT // 2
        sel = io_cast(stft.decim_sel_arr(hop, downsample_rate))
        # Explicitly 768-padded dense basis: ~22% faster than XLA's
        # implicit 644->768 pad at highest/bf16 (stft_layout_exp.py);
        # bitwise-safe, consumers slice the first 4*n_bins columns.
        basis = io_cast(stft.segmat_basis_padded_arr(den_mod._WINDOW, NSNET2_N_FFT))
        t = audio.shape[-1]
        segs48 = audio.reshape(audio.shape[:-1] + (t // seg48, seg48))
        prec = matmul_precision("stft")
        # The select matmul is exact at HIGH already: 1.0 is exact in bf16
        # and the 3-way operand split of x sums back to exactly x*1.0, so
        # the 6-pass HIGHEST spend is pure waste on a 0/1 operand. Lower
        # precisions keep the mode's own level (operand rounding then
        # matches the fused basis matmul's bit-for-bit).
        sel_prec = (
            jax.lax.Precision.HIGH if prec == jax.lax.Precision.HIGHEST else prec
        )
        segs16 = jnp.matmul(io_cast(segs48), sel, precision=sel_prec)
        if raw_tail is None:  # stream start (segmat_segments' zero default)
            tail16 = jnp.zeros(segs16.shape[:-2] + (1, hop), segs16.dtype)
        else:
            tail16 = jnp.matmul(
                io_cast(raw_tail[..., None, :]), sel, precision=sel_prec
            )
        segs = jnp.concatenate([tail16.astype(segs16.dtype), segs16], axis=-2)
        return jnp.matmul(io_cast(segs), basis, precision=prec)
    basis = stft.segmat_basis_arr(den_mod._WINDOW, NSNET2_N_FFT, downsample_rate)
    segs = stft.segmat_segments(audio, seg48, raw_tail)
    return jnp.matmul(
        io_cast(segs), io_cast(basis), precision=matmul_precision("stft")
    )


def _model_input(feats: jnp.ndarray, feat_ctx: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-chunk model input [..., K, 54, 161]: 4 context frames + 50
    current frames; context for chunk 0 comes from the carry (zeros at
    stream start, NSNet2.zig:77-79). Built from slices (not a gather):
    chunk k's context = frames 46..50 of chunk k-1."""
    lead = feats.shape[:-2]
    main = feats.reshape(lead + (k, NSNET2_N_FRAMES, NSNET2_N_BINS))
    prev_tail = jnp.concatenate(
        [
            # Carries stay f32 across slab/checkpoint boundaries; cast at the
            # join so bf16 activation storage (precision.io_dtype) doesn't
            # silently promote the big tensors back to f32.
            feat_ctx[..., None, :, :].astype(feats.dtype),
            main[..., :-1, NSNET2_N_FRAMES - NSNET2_CONTEXT_FRAMES :, :],
        ],
        axis=-3,
    )
    return jnp.concatenate([prev_tail, main], axis=-2)


def _gained_spectra_from_prod(
    params: nsnet2.NSNet2Params,
    prod: jnp.ndarray,
    carry: dict,
    rider=None,
):
    """Back half of the chunk-parallel denoise, starting from the raw
    segment-matmul product: spectra shift-add, features, per-chunk stateless
    model run, clipped gains.

    Returns (re, im, g, feats[, rider_out]), spectra [..., K*50, 161]."""
    lead = prod.shape[:-2]  # (..., C)
    k = (prod.shape[-2] - 1) // NSNET2_N_FRAMES
    re, im = stft.segmat_spectra(prod, NSNET2_N_FFT)  # [..., K*50, 161]

    feats = den_mod.compute_features(re, im)  # [..., K*50, 161]
    model_in = _model_input(feats, carry["feat_ctx"], k)  # [..., K, 54, 161]
    n_model_frames = NSNET2_N_FRAMES + NSNET2_CONTEXT_FRAMES  # 54

    # Stateless model run per chunk, batched over every leading axis * K.
    from ..models.registry import apply_model

    flat = model_in.reshape((-1, n_model_frames, NSNET2_N_BINS))
    out = apply_model(params, flat, out_frames=NSNET2_N_FRAMES, rider=rider)
    gains, rider_out = out if rider is not None else (out, None)  # [N, 50, 161]
    gains = gains.reshape(lead + (k * NSNET2_N_FRAMES, NSNET2_N_BINS))
    g = jnp.clip(gains, den_mod.GAIN_MIN, den_mod.GAIN_MAX)
    if rider is not None:
        return re, im, g, feats, rider_out
    return re, im, g, feats


def _gained_spectra(
    params: nsnet2.NSNet2Params,
    audio: jnp.ndarray,
    carry: dict,
    downsample_rate: int = 3,
):
    """Shared front half of the chunk-parallel denoise: decimating STFT,
    features, per-chunk stateless model run, clipped gains.

    Returns (re, im, g, feats), each [..., K*50, 161]."""
    t48 = audio.shape[-1]
    chunk48 = NSNET2_CHUNK_16K * downsample_rate
    assert t48 % chunk48 == 0, "length must be a multiple of the chunk size"

    # Fused decimate+window+rDFT: one MXU matmul straight on the 48 kHz audio
    # (stft_segmat folds the 48k->16k decimation into the DFT basis); the
    # carried raw tail is the previous slab's final hop-segment
    # (NSNet2.zig:115-117,175-179 input-tail chain).
    prod = segmat_prod(audio, carry["raw_tail"], downsample_rate)
    return _gained_spectra_from_prod(params, prod, carry)


def denoise_offline_spec(
    params: nsnet2.NSNet2Params,
    audio: jnp.ndarray,
    carry: dict,
    downsample_rate: int = 3,
    *,
    prod: jnp.ndarray | None = None,
    rider=None,
):
    """Chunk-parallel denoise stopping at the GAINED SPECTRA — the input of
    the fully-folded scoring band path (``stft.band_volume_spec``), which
    never materializes the denoised stream at any rate.  The denoiser
    boundary carry is produced directly from the spectra: the OLA tail is
    the final frame's inverse bottom half and the lerp last-sample is the
    two-term OLA of the final stream sample (both tiny matmuls; same
    linear-map-reassociation deviation class as the fold itself).

    ``prod``: the slab's precomputed segment-matmul product (the cross-slab
    pipelined path computed it inside the PREVIOUS slab's GRU scan);
    ``rider``: (fn, xs) work to thread through THIS slab's GRU scan (the
    next slab's segment matmul). See ``window_inputs_pipelined``.

    Returns (re_g, im_g [..., K*50, 161], new_carry[, rider_out])."""
    if prod is None:
        prod = segmat_prod(audio, carry["raw_tail"], downsample_rate)
    out = _gained_spectra_from_prod(params, prod, carry, rider=rider)
    if rider is not None:
        re, im, g, feats, rider_out = out
    else:
        (re, im, g, feats), rider_out = out, None
    re_g, im_g = re * g, im * g
    out_tail, last_sample = band_boundary_carry(re_g, im_g)
    cdt = carry["feat_ctx"].dtype
    new_carry = {
        "raw_tail": audio[..., -NSNET2_N_HOP * downsample_rate :],
        "feat_ctx": feats[..., -NSNET2_CONTEXT_FRAMES:, :].astype(cdt),
        "out_tail": out_tail.astype(cdt),
        "last_sample": last_sample.astype(cdt),
    }
    if rider is not None:
        return re_g, im_g, new_carry, rider_out
    return re_g, im_g, new_carry


def band_boundary_carry(re_g: jnp.ndarray, im_g: jnp.ndarray):
    """(out_tail [..., hop], last_sample [...]) from the final two gained
    frames — the inverse-basis epilogue feeding the next slab's composite
    band corrections (the OLA tail is the final frame's inverse bottom
    half; the lerp last-sample is the two-term OLA of the final stream
    sample — NSNet2.zig:175-203 tail chain). Shared verbatim by
    ``denoise_offline_spec`` and the deep-pipelined path."""
    hop = NSNET2_N_HOP
    key = hash(np.asarray(den_mod._WINDOW, np.float32).tobytes())
    stft._SEGMAT_WINDOWS[key] = np.asarray(den_mod._WINDOW, np.float32)
    inv = jnp.asarray(stft._inv_segmat_basis(key, NSNET2_N_FFT))  # [322, 320]
    from ..ops.precision import matmul_precision

    z_last = jnp.concatenate(
        [re_g[..., -1, :], im_g[..., -1, :]], axis=-1
    ).astype(jnp.float32)
    z_prev = jnp.concatenate(
        [re_g[..., -2, :], im_g[..., -2, :]], axis=-1
    ).astype(jnp.float32)
    prec = matmul_precision("istft")
    out_tail = jnp.matmul(z_last, inv[:, hop:], precision=prec)  # [..., hop]
    last_sample = jnp.matmul(z_last, inv[:, hop - 1], precision=prec) + jnp.matmul(
        z_prev, inv[:, 2 * hop - 1], precision=prec
    )
    return out_tail, last_sample


def denoise_offline_16k(
    params: nsnet2.NSNet2Params,
    audio: jnp.ndarray,
    carry: dict,
    downsample_rate: int = 3,
    *,
    prod: jnp.ndarray | None = None,
):
    """Chunk-parallel denoise of one slab, stopping at the 16 kHz output.

    The full pipeline's scoring path never needs the upsampled 48 kHz
    stream (its only consumer is the band DFT, which ``stft.band_volume_16k``
    computes directly from the 16 kHz signal with the lerp fold) — callers
    that must EMIT audio wrap this with ``resample.upsample`` via
    ``denoise_offline_carry``.

    Args:
      audio: [..., C, S] slab, S a multiple of the 24000-sample chunk.
      prod: optional precomputed segment product (the flat cross-slab
        overlap computed it in the previous call's program — bitwise the
        in-place ``segmat_prod``, same op either way).
    Returns:
      (completed16 [..., C, S/rate], prev16 [..., C] — the 16 kHz sample
       preceding this slab (the lerp carry), new_carry).
    """
    chunk48 = NSNET2_CHUNK_16K * downsample_rate
    k = audio.shape[-1] // chunk48
    if prod is None:
        re, im, g, feats = _gained_spectra(params, audio, carry, downsample_rate)
    else:
        re, im, g, feats = _gained_spectra_from_prod(params, prod, carry)

    # Global OLA == the per-chunk output-tail chain (see module docstring);
    # one matmul + shift-add (istft_segmat). The carried OLA tail adds onto
    # the first hop; the dangling final hop becomes the next carry.
    ola = stft.istft_segmat(re * g, im * g, den_mod._WINDOW, NSNET2_N_FFT)
    ola = ola.at[..., :NSNET2_N_HOP].add(carry["out_tail"].astype(ola.dtype))
    completed = ola[..., : k * NSNET2_CHUNK_16K]

    cdt = carry["feat_ctx"].dtype  # carries keep their f32 storage dtype
    new_carry = {
        "raw_tail": audio[..., -NSNET2_N_HOP * downsample_rate :],
        "feat_ctx": feats[..., -NSNET2_CONTEXT_FRAMES:, :].astype(cdt),
        "out_tail": ola[..., k * NSNET2_CHUNK_16K :].astype(cdt),
        "last_sample": completed[..., -1].astype(cdt),
    }
    return completed, carry["last_sample"].astype(completed.dtype), new_carry


def denoise_offline_carry(
    params: nsnet2.NSNet2Params,
    audio: jnp.ndarray,
    carry: dict,
    downsample_rate: int = 3,
):
    """Chunk-parallel denoise of one slab with explicit boundary state.

    Chaining slabs through the carry is bit-identical to one whole-stream
    ``denoise_offline`` run (and hence to the streaming chunk chain).

    Args:
      audio: [..., C, S] slab, S a multiple of the 24000-sample chunk.
    Returns:
      (denoised [..., C, S], new_carry).
    """
    completed, prev16, new_carry = denoise_offline_16k(
        params, audio, carry, downsample_rate
    )
    up, _ = resample.upsample(completed, prev16, downsample_rate)
    return up, new_carry


def denoise_offline(
    params: nsnet2.NSNet2Params, audio: jnp.ndarray, downsample_rate: int = 3
) -> jnp.ndarray:
    """Denoise a whole stream at once; identical to chaining denoise_chunk.

    Args:
      audio: [..., C, T] with T a multiple of the 24000-sample chunk.
    Returns:
      denoised [..., C, T].
    """
    n_ch = audio.shape[-2]
    lead = audio.shape[:-2]
    carry = init_slab_carry(n_ch, downsample_rate, audio.dtype)
    if lead:
        carry = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, lead + x.shape), carry
        )
    up, _ = denoise_offline_carry(params, audio, carry, downsample_rate)
    return up


WARMUP_CHUNKS = 2


def denoise_span(
    params: nsnet2.NSNet2Params,
    audio: jnp.ndarray,
    start_chunk: int,
    end_chunk: int,
    downsample_rate: int = 3,
) -> jnp.ndarray:
    """Exactly recompute denoised audio for chunks [start_chunk, end_chunk).

    The streaming denoiser's carried state has a *bounded* dependency
    horizon: chunk k's output is an exact function of input chunks k-2..k
    (the input tail reaches 160 samples back, the OLA output tail one frame
    of the previous chunk, the feature context 4 frames — all within two
    chunks).  So a zero-initialized run beginning WARMUP_CHUNKS earlier
    reproduces the target span bit-exactly — this is how recordings of
    *denoised* audio are extracted after a batched scoring pass without
    keeping the full denoised stream in memory.

    Args:
      audio: [..., C, T] full original stream.
    Returns:
      denoised [..., C, (end_chunk - start_chunk) * chunk].
    """
    chunk48 = NSNET2_CHUNK_16K * downsample_rate
    k0 = max(0, start_chunk - WARMUP_CHUNKS)
    span = audio[..., k0 * chunk48 : end_chunk * chunk48]
    den = denoise_offline(params, span, downsample_rate)
    return den[..., (start_chunk - k0) * chunk48 :]


def _band_spec(st, re_g, im_g, prev16, out_tail_prev, n_windows):
    """The composite scoring band volumes from the gained spectra — the ONE
    call site shape shared by the plain and pipelined paths (the arguments
    must stay identical for their bitwise-parity contract)."""
    return stft.band_volume_spec(
        re_g, im_g, prev16, out_tail_prev,
        den_mod._WINDOW, vad._hann(st.fft_size),
        NSNET2_N_FFT, st.fft_size, st.norm_factor,
        st.min_bin, st.max_bin, n_windows, rate=st.downsample_rate,
        variant=band_composite_variant(),
    )


def window_inputs_carry(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    den_carry: dict,
    n_valid_chunks: jnp.ndarray,
    collect_denoised: bool = False,
):
    """Compute the FSM's per-window inputs for one stream/slab (all parallel),
    threading the denoiser boundary carry.

    Requires T to be a multiple of lcm(chunk, fft_size) for slab chaining
    (so the window accumulator is empty at the boundary); any multiple of
    the chunk works for single-shot use.

    Returns (new_den_carry, min_vol [W], ratios [W], valid [W], denoised|None).
    """
    c, t = audio.shape
    chunk = st.chunk_size
    k = t // chunk
    audio = audio[:, : k * chunk]

    n_windows = (k * chunk) // st.fft_size
    denoised = None
    if not collect_denoised and band_composite_enabled():
        # Fully-folded scoring band: iSTFT + OLA + upsample + band DFT as one
        # strided conv from the gained spectra (stft.band_volume_spec) — the
        # denoised stream is never materialized at ANY rate. Same linear
        # map, different evaluation order (PARITY.md deviation 11).
        prev16 = den_carry["last_sample"]
        out_tail_prev = den_carry["out_tail"]
        re_g, im_g, den_carry = denoise_offline_spec(
            params, audio, den_carry, st.downsample_rate
        )
        band = _band_spec(st, re_g, im_g, prev16, out_tail_prev, n_windows)
    else:
        completed16, prev16, den_carry = denoise_offline_16k(
            params, audio, den_carry, st.downsample_rate
        )
        # Scoring-path band volumes come straight from the 16 kHz signal with
        # the lerp upsample folded into the DFT basis — the 48 kHz denoised
        # stream (3x the bytes) is materialized only when a caller asks for it.
        band = stft.band_volume_16k(
            completed16, prev16, vad._hann(st.fft_size), st.fft_size,
            st.norm_factor, st.min_bin, st.max_bin, n_windows,
            rate=st.downsample_rate,
        )
        if collect_denoised:
            denoised, _ = resample.upsample(completed16, prev16, st.downsample_rate)
    min_vol = jnp.min(band, axis=0)
    ratios, valid = _ratios_valid(st, audio, n_valid_chunks, n_windows)
    return den_carry, min_vol, ratios, valid, denoised


def _ratios_valid(
    st: vad.VADStatics,
    audio: jnp.ndarray,
    n_valid_chunks: jnp.ndarray,
    n_windows: int,
):
    """Per-window volume ratios + validity from the raw slab audio (the
    FSM's second input; vad.chunk_step step 5 semantics)."""
    c = audio.shape[0]
    chunk = st.chunk_size
    k = audio.shape[-1] // chunk
    # Channel-axis reductions directly on the [C, K, chunk] layout (a
    # [K, C, chunk] transpose relayouts the entire stream on TPU); values
    # are bitwise those of volume.volume_analysis per chunk.
    vols = volume.rms_volume(audio.reshape(c, k, chunk))  # [C, K]
    vol_min = jnp.minimum(jnp.min(vols, axis=0), 1.0)
    vol_max = jnp.maximum(jnp.max(vols, axis=0), 0.0)
    ratio_chunk = jnp.where(vol_max == 0.0, 0.0, vol_min / vol_max)
    w = jnp.arange(n_windows)
    w_start = w * st.fft_size
    w_end = w_start + st.fft_size
    c0 = w_start // chunk
    c1 = (w_end - 1) // chunk
    boundary = (c0 + 1) * chunk
    n_in_c0 = jnp.minimum(boundary - w_start, st.fft_size)
    r0 = ratio_chunk[jnp.clip(c0, 0, k - 1)]
    r1 = ratio_chunk[jnp.clip(c1, 0, k - 1)]
    weighted = (
        n_in_c0.astype(jnp.float32) * r0
        + (st.fft_size - n_in_c0).astype(jnp.float32) * r1
    ) / np.float32(st.fft_size)
    # Windows fully inside one chunk take that chunk's ratio VERBATIM, like
    # the scan path (vad.chunk_step step 5) — the weighted form is
    # mathematically the same but rounds differently (and XLA's FMA
    # formation is fusion-context-dependent), breaking bitwise cross-path
    # identity of seg_ratio.
    ratios = jnp.where(c0 == c1, r0, weighted)
    valid = w_end <= n_valid_chunks * chunk
    return ratios, valid


T_SCAN = NSNET2_N_FRAMES + NSNET2_CONTEXT_FRAMES  # GRU scan length (54)


def next_slab_rider(
    audio_next: jnp.ndarray, raw_tail: jnp.ndarray, downsample_rate: int = 3
):
    """Build the rider computing the NEXT slab's segment product in T_SCAN
    row slices fed through the current slab's GRU scan — one MXU dot per
    scan step, scheduled by the TensorCore alongside the VPU gate math so
    the front-end of slab s+1 hides inside the recurrence of slab s
    (cross-slab software pipelining, ROOFLINE.md §"Why not higher MFU?").

    Matmuls are row-independent, so the row-sliced product is bitwise the
    one-shot ``segmat_prod`` (asserted in tests/test_pipelined.py).

    Returns ((fn, xs) for nsnet2.apply_streaming, assemble(rider_out) ->
    prod_next [..., S+1, 4*161])."""
    from ..ops.precision import io_cast, matmul_precision

    seg = (NSNET2_N_FFT // 2) * downsample_rate
    basis = io_cast(stft.segmat_basis_arr(den_mod._WINDOW, NSNET2_N_FFT, downsample_rate))
    segs = io_cast(stft.segmat_segments(audio_next, seg, raw_tail))
    rows = segs.shape[-2]
    per = -(-rows // T_SCAN)
    pad = T_SCAN * per - rows
    if pad:
        segs = jnp.pad(segs, [(0, 0)] * (segs.ndim - 2) + [(0, pad), (0, 0)])
    prec = matmul_precision("stft")

    def fn(t):
        rows_t = jax.lax.dynamic_slice_in_dim(segs, t * per, per, axis=-2)
        return jnp.matmul(rows_t, basis, precision=prec)

    def assemble(rider_out):
        # [T, ..., per, 644] -> [..., T*per, 644] -> drop the zero pad rows.
        p = jnp.moveaxis(rider_out, 0, -3)
        p = p.reshape(p.shape[:-3] + (T_SCAN * per, p.shape[-1]))
        return p[..., :rows, :]

    return (fn, jnp.arange(T_SCAN, dtype=jnp.int32)), assemble


def window_inputs_pipelined(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    prod: jnp.ndarray,
    den_carry: dict,
    n_valid_chunks: jnp.ndarray,
    audio_next: jnp.ndarray,
):
    """Window inputs for slab s from its PRECOMPUTED segment product, while
    computing slab s+1's segment product inside this slab's GRU scan (the
    rider).  Composite-band scoring path only (the default); outputs are
    bitwise ``window_inputs_carry``'s — the pipeline only moves WHEN the
    front-end matmul executes, never what it computes.

    The steady-state device step therefore contains no standalone front-end
    stage: slab s's big matmul already happened during slab s-1's scan.

    Args:
      audio: [C, T] slab s (RMS ratios + the next rider's raw tail).
      prod: [C, S+1, 4*161] slab s's segment product (from the previous
        call's rider, or ``segmat_prod`` for the first slab).
      audio_next: [C, T] slab s+1 (zeros for the final slab — its product
        is computed and discarded).
    Returns:
      (new_den_carry, min_vol [W], ratios [W], valid [W], prod_next).
    """
    c, t = audio.shape
    chunk = st.chunk_size
    k = t // chunk
    audio = audio[:, : k * chunk]
    audio_next = audio_next[:, : (audio_next.shape[-1] // chunk) * chunk]
    n_windows = (k * chunk) // st.fft_size
    prev16 = den_carry["last_sample"]
    out_tail_prev = den_carry["out_tail"]
    rider, assemble = next_slab_rider(
        audio_next,
        audio[..., -NSNET2_N_HOP * st.downsample_rate :],
        st.downsample_rate,
    )
    re_g, im_g, den_carry, rider_out = denoise_offline_spec(
        params, audio, den_carry, st.downsample_rate, prod=prod, rider=rider
    )
    prod_next = assemble(rider_out)
    band = _band_spec(st, re_g, im_g, prev16, out_tail_prev, n_windows)
    min_vol = jnp.min(band, axis=0)
    ratios, valid = _ratios_valid(st, audio, n_valid_chunks, n_windows)
    return den_carry, min_vol, ratios, valid, prod_next


def window_inputs_flat(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    prod: jnp.ndarray,
    den_carry: dict,
    n_valid_chunks: jnp.ndarray,
    audio_next: jnp.ndarray,
):
    """FLAT cross-slab overlap on the MATERIALIZE scoring path (the shipping
    default): slab s's window inputs from its PRECOMPUTED segment product,
    while slab s+1's product is computed as an INDEPENDENT flat op in the
    same program — no rider, no forced scan-body placement; XLA's scheduler
    overlaps the big matmul with the GRU recurrence on its own
    (`benchmarks/fe_overlap_ab.py`: flat gru+stft 3.58 ms vs 5.50 serial at
    bf16, beating the rider's 3.75 — and the rider LOST end-to-end,
    ROOFLINE.md dead-end section).

    Bitwise-trivial: ``prod`` is produced by the identical one-shot
    ``segmat_prod`` call on every backend — only WHICH program computes it
    moves, never the op — so outputs equal ``window_inputs_carry``'s
    exactly (no MXU row-order argument needed, unlike the rider).

    Args:
      audio: [C, T] slab s; prod: [C, S+1, 4*161] slab s's product
        (previous call's ``prod_next``, or ``segmat_prod`` for slab 0);
      audio_next: [C, T'] slab s+1 (zeros for the final slab — its product
        is computed and discarded).
    Returns:
      (new_den_carry, min_vol [W], ratios [W], valid [W], prod_next).
    """
    c, t = audio.shape
    chunk = st.chunk_size
    k = t // chunk
    audio = audio[:, : k * chunk]
    an = audio_next[:, : (audio_next.shape[-1] // chunk) * chunk]
    n_windows = (k * chunk) // st.fft_size
    prod_next = segmat_prod(
        an, audio[..., -NSNET2_N_HOP * st.downsample_rate :], st.downsample_rate
    )
    completed16, prev16, den_carry = denoise_offline_16k(
        params, audio, den_carry, st.downsample_rate, prod=prod
    )
    band = stft.band_volume_16k(
        completed16, prev16, vad._hann(st.fft_size), st.fft_size,
        st.norm_factor, st.min_bin, st.max_bin, n_windows,
        rate=st.downsample_rate,
    )
    min_vol = jnp.min(band, axis=0)
    ratios, valid = _ratios_valid(st, audio, n_valid_chunks, n_windows)
    return den_carry, min_vol, ratios, valid, prod_next


def window_inputs_batch_flat(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    prod: jnp.ndarray,
    den_carry: dict,
    audio_next: jnp.ndarray,
    n_valid_chunks: jnp.ndarray | None = None,
):
    """Batched ``window_inputs_flat`` (see there; mirrors
    ``window_inputs_batch_pipelined``'s signature so runners/bench swap
    between the cross-slab modes freely)."""
    b, c, t = audio.shape
    k = t // st.chunk_size
    if n_valid_chunks is None:
        n_valid_chunks = jnp.full((b,), k, jnp.int32)
    return jax.vmap(
        lambda a, p, dc, n, an: window_inputs_flat(params, st, a, p, dc, n, an)
    )(audio, prod, den_carry, n_valid_chunks, audio_next)


def _compose_riders(r1, r2):
    """Two independent riders through one scan: fn((a, b)) = (f1(a), f2(b))."""
    (f1, x1), (f2, x2) = r1, r2
    return (lambda xs: (f1(xs[0]), f2(xs[1])), (x1, x2))


def deferred_head_rider(params: nsnet2.NSNet2Params, ys, re, im):
    """Rider applying the PREVIOUS slab's deferred FF head + gain clip +
    gain application in frame-row slices through this slab's GRU scan
    (stage 2 of the cross-slab pipeline: with the head deferred, every MXU
    stage outside the recurrences rides a scan).

    ys: [..., F, 400] raw GRU outputs as stored by ``defer_head`` (io
    dtype); re/im: that slab's spectra. The head weights get the same
    io_cast ``apply_streaming`` would apply, so the deferred computation is
    op-for-op the immediate one (row-sliced — PARITY.md deviation 12's
    row-count note applies).

    Returns ((fn, xs), assemble) with assemble(parts) -> (re_g, im_g)."""
    from ..ops import precision as _prec

    head = params
    if _prec.io_dtype() is not None:
        head = jax.tree_util.tree_map(_prec.io_cast, params)
    f = ys.shape[-2]
    per = -(-f // T_SCAN)
    pad = T_SCAN * per - f

    def padf(x):
        if not pad:
            return x
        return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)])

    ys_p, re_p, im_p = padf(ys), padf(re), padf(im)

    def fn(t):
        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, t * per, per, axis=-2)

        g = nsnet2.apply_head(head, sl(ys_p))
        g = jnp.clip(g, den_mod.GAIN_MIN, den_mod.GAIN_MAX)
        return sl(re_p) * g, sl(im_p) * g

    def assemble(parts):
        def fix(p):
            p = jnp.moveaxis(p, 0, -3)
            p = p.reshape(p.shape[:-3] + (T_SCAN * per, p.shape[-1]))
            return p[..., :f, :]

        re_g, im_g = parts
        return fix(re_g), fix(im_g)

    return (fn, jnp.arange(T_SCAN, dtype=jnp.int32)), assemble


def init_deep_state(
    n_channels: int,
    slab_chunks: int,
    fft_size: int = 1024,
    downsample_rate: int = 3,
):
    """Deferred per-slab state for the deep pipeline (``window_inputs_deep``):
    the previous slab's raw GRU outputs + spectra (its head/gains/band are
    computed one call later), its already-computed ratios/valid, and the
    band boundary carries for ITS band call."""
    from ..ops.precision import io_dtype

    io = io_dtype() or jnp.float32
    f = slab_chunks * NSNET2_N_FRAMES
    w = slab_chunks * NSNET2_CHUNK_16K * downsample_rate // fft_size
    c = n_channels
    return {
        "ys": jnp.zeros((c, f, nsnet2.HIDDEN), io),
        "re": jnp.zeros((c, f, NSNET2_N_BINS), io),
        "im": jnp.zeros((c, f, NSNET2_N_BINS), io),
        "ratios": jnp.zeros((w,), jnp.float32),
        "valid": jnp.zeros((w,), bool),
        "prev16": jnp.zeros((c,), jnp.float32),
        "out_tail": jnp.zeros((c, NSNET2_N_HOP), jnp.float32),
    }


def window_inputs_deep(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    prod: jnp.ndarray,
    deep: dict,
    den_carry: dict,
    n_valid_chunks: jnp.ndarray,
    audio_next: jnp.ndarray,
):
    """Stage-2 ("deep") cross-slab pipelined step: call s EMITS slab s-1's
    window inputs.  Two riders share slab s's GRU scan — slab s+1's segment
    matmul (stage 1) and slab s-1's deferred FF head + gain application —
    so in steady state EVERY MXU stage except the scan's own projections
    and the fc_in/gi1 prep executes inside some slab's recurrence.

    Protocol: call 0 primes (its emission is the zero deep state — drop
    it); after the last real slab, one FLUSH call with zero audio drains
    slab N-1.  Same ops as the plain path, moved across call boundaries
    (PARITY.md deviation 12 extension); NSNet2-only (duck-typed gain
    models have no deferred head).

    Returns (new_den_carry, new_deep, (min_vol, ratios, valid) FOR SLAB
    s-1, prod_next)."""
    c, t = audio.shape
    chunk = st.chunk_size
    k = t // chunk
    audio = audio[:, : k * chunk]
    audio_next = audio_next[:, : (audio_next.shape[-1] // chunk) * chunk]
    n_windows = (k * chunk) // st.fft_size
    lead = prod.shape[:-2]

    # Pre-scan work for slab s (identical ops to _gained_spectra_from_prod).
    re, im = stft.segmat_spectra(prod, NSNET2_N_FFT)
    feats = den_mod.compute_features(re, im)
    model_in = _model_input(feats, den_carry["feat_ctx"], k)

    rider_a, assemble_a = next_slab_rider(
        audio_next,
        audio[..., -NSNET2_N_HOP * st.downsample_rate :],
        st.downsample_rate,
    )
    rider_b, assemble_b = deferred_head_rider(
        params, deep["ys"], deep["re"], deep["im"]
    )
    rider = _compose_riders(rider_a, rider_b)

    flat = model_in.reshape((-1, T_SCAN, NSNET2_N_BINS))
    ys_flat, (prod_parts, head_parts) = nsnet2.apply(
        params, flat, out_frames=NSNET2_N_FRAMES, rider=rider, defer_head=True
    )
    ys = ys_flat.reshape(lead + (k * NSNET2_N_FRAMES, nsnet2.HIDDEN))
    prod_next = assemble_a(prod_parts)
    re_g_prev, im_g_prev = assemble_b(head_parts)

    # Slab s-1's band volumes + emission (its ratios/valid were computed in
    # call s-1 from its own raw audio and stored).
    band = _band_spec(
        st, re_g_prev, im_g_prev, deep["prev16"], deep["out_tail"], n_windows
    )
    emission = (jnp.min(band, axis=0), deep["ratios"], deep["valid"])
    out_tail, last_sample = band_boundary_carry(re_g_prev, im_g_prev)

    ratios, valid = _ratios_valid(st, audio, n_valid_chunks, n_windows)
    cdt = den_carry["feat_ctx"].dtype
    new_den = {
        "raw_tail": audio[..., -NSNET2_N_HOP * st.downsample_rate :],
        "feat_ctx": feats[..., -NSNET2_CONTEXT_FRAMES:, :].astype(cdt),
        # Unused in deep mode (the band boundary carries live in `deep`,
        # one slab delayed); passed through for carry-shape stability.
        "out_tail": den_carry["out_tail"],
        "last_sample": den_carry["last_sample"],
    }
    new_deep = {
        "ys": ys,
        "re": re,
        "im": im,
        "ratios": ratios,
        "valid": valid,
        "prev16": last_sample,
        "out_tail": out_tail,
    }
    return new_den, new_deep, emission, prod_next


def window_inputs_batch_deep(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    prod: jnp.ndarray,
    deep: dict,
    den_carry: dict,
    audio_next: jnp.ndarray,
    n_valid_chunks: jnp.ndarray | None = None,
):
    """Batched ``window_inputs_deep`` (see there for the protocol)."""
    b, c, t = audio.shape
    k = t // st.chunk_size
    if n_valid_chunks is None:
        n_valid_chunks = jnp.full((b,), k, jnp.int32)
    return jax.vmap(
        lambda a, p, dp, dc, n, an: window_inputs_deep(
            params, st, a, p, dp, dc, n, an
        )
    )(audio, prod, deep, den_carry, n_valid_chunks, audio_next)


def window_inputs(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    n_valid_chunks: jnp.ndarray,
):
    """Fresh-state window inputs for one stream: (min_vol, ratios, valid)."""
    carry = init_slab_carry(st.n_channels, st.downsample_rate, audio.dtype)
    _, min_vol, ratios, valid, _ = window_inputs_carry(
        params, st, audio, carry, n_valid_chunks
    )
    return min_vol, ratios, valid


def window_inputs_batch(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    n_valid_chunks: jnp.ndarray | None = None,
):
    """Jittable batched front-end: everything except the FSM.

    Args:
      audio: [B, C, T], T a multiple of chunk_size.
    Returns:
      (min_vol, ratios [B, W] f32, valid [B, W] bool) — the FSM's inputs,
      consumed either by the device FSM stages or by the host-C decoder
      (``fsm_host.scan_windows_host``), which overlaps device compute.
    """
    b, c, t = audio.shape
    k = t // st.chunk_size
    if n_valid_chunks is None:
        n_valid_chunks = jnp.full((b,), k, jnp.int32)
    return jax.vmap(lambda a, n: window_inputs(params, st, a, n))(
        audio, n_valid_chunks
    )


def window_inputs_batch_pipelined(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    prod: jnp.ndarray,
    den_carry: dict,
    audio_next: jnp.ndarray,
    n_valid_chunks: jnp.ndarray | None = None,
):
    """Batched, carried, cross-slab-pipelined front-end (host-FSM mode's
    device step).  See ``window_inputs_pipelined``.

    Args:
      audio / audio_next: [B, C, T] slab s and s+1.
      prod: [B, C, S+1, 4*161] slab s's segment product.
    Returns:
      (new_den_carry, min_vol, ratios, valid [B, W], prod_next).
    """
    b, c, t = audio.shape
    k = t // st.chunk_size
    if n_valid_chunks is None:
        n_valid_chunks = jnp.full((b,), k, jnp.int32)
    return jax.vmap(
        lambda a, p, dc, n, an: window_inputs_pipelined(params, st, a, p, dc, n, an)
    )(audio, prod, den_carry, n_valid_chunks, audio_next)


def process_batch_offline(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    n_valid_chunks: jnp.ndarray | None = None,
    fsm_params: Optional[fsm.FSMParams] = None,
    use_pallas_fsm: bool = True,
    pallas_interpret: bool = False,
):
    """Batched whole-stream VAD: vmapped chunk-parallel front-end + one FSM
    stage over the [B, W] window batch — as the Pallas kernel (one program
    per stream, state in VMEM) or a vmapped lax.scan.

    Args:
      audio: [B, C, T], T a multiple of chunk_size.
      n_valid_chunks: [B] real chunk counts (ragged batches).
    Returns:
      (WindowOutput [B, W(,K)], valid [B, W]).
    """
    b, c, t = audio.shape
    k = t // st.chunk_size
    if n_valid_chunks is None:
        n_valid_chunks = jnp.full((b,), k, jnp.int32)
    fsm_p = fsm_params if fsm_params is not None else st.fsm_params

    min_vol, ratios, valid = window_inputs_batch(
        params, st, audio, n_valid_chunks
    )  # each [B, W]

    sweeping = np.ndim(fsm_p.threshold_factor) == 1
    if use_pallas_fsm and not sweeping:
        from . import fsm_pallas

        win_out = fsm_pallas.scan_windows_pallas(
            st.fsm_shape, fsm_p, min_vol, ratios, valid, interpret=pallas_interpret
        )
        return win_out, valid

    w = min_vol.shape[1]

    def scan_one(mv, vr, va):
        if sweeping:
            carry = jax.vmap(lambda pp: fsm.init_carry(st.fsm_shape, pp))(fsm_p)
        else:
            carry = fsm.init_carry(st.fsm_shape, fsm_p)
        # Tie the carry to the (varying) inputs so scan's carry types match
        # inside shard_map manual regions.
        vz = 0.0 * mv[0]
        carry = jax.tree_util.tree_map(lambda x: x + vz.astype(x.dtype), carry)
        _, out = fsm.scan_windows(
            st.fsm_shape, fsm_p, carry, mv, vr, jnp.arange(w, dtype=jnp.int32), va
        )
        return out

    win_out = jax.vmap(scan_one)(min_vol, ratios, valid)
    return win_out, valid


def process_stream_offline(
    params: nsnet2.NSNet2Params,
    st: vad.VADStatics,
    audio: jnp.ndarray,
    n_valid_chunks: jnp.ndarray | None = None,
    fsm_params: Optional[fsm.FSMParams] = None,
    collect_denoised: bool = False,
):
    """Whole-stream VAD with chunk-parallel denoise/FFT and one FSM scan.

    Args:
      audio: [C, T], T a multiple of chunk_size.
      n_valid_chunks: scalar count of real (non-padding) chunks.
    Returns:
      (windows: fsm.WindowOutput over [n_windows], window_valid [n_windows],
       denoised or None) — flat over windows (the scan path's
       [n_chunks, max_windows] layout collapses here).
    """
    c, t = audio.shape
    chunk = st.chunk_size
    k = t // chunk
    audio = audio[:, : k * chunk]
    if n_valid_chunks is None:
        n_valid_chunks = jnp.int32(k)

    den_carry = init_slab_carry(st.n_channels, st.downsample_rate, audio.dtype)
    _, min_vol, ratios, valid, denoised = window_inputs_carry(
        params, st, audio, den_carry, n_valid_chunks, collect_denoised=collect_denoised
    )
    n_windows = min_vol.shape[-1]

    # ---- FSM scan (the only sequential program) ----------------------------
    fsm_p = fsm_params if fsm_params is not None else st.fsm_params
    if np.ndim(fsm_p.threshold_factor) == 1:
        fsm_carry = jax.vmap(lambda pp: fsm.init_carry(st.fsm_shape, pp))(fsm_p)
    else:
        fsm_carry = fsm.init_carry(st.fsm_shape, fsm_p)
    _, win_out = fsm.scan_windows(
        st.fsm_shape, fsm_p, fsm_carry, min_vol, ratios,
        jnp.arange(n_windows, dtype=jnp.int32), valid,
    )
    return win_out, valid, denoised


def segments_from_offline(st: vad.VADStatics, win_out: fsm.WindowOutput) -> list[dict]:
    """Host-side segment extraction (same semantics as the scan path)."""
    return vad.segments_from_outputs(
        st,
        vad.ChunkOutput(windows=win_out, window_valid=None, denoised=None),
    )
