"""The full VAD compute step: one pure function per 0.5 s pipeline chunk.

Composes the stages the reference chains as stateful objects
(``src/AudioPipeline/VADPipeline.zig:144-237``):

    chunk[C, 24000] --(volume analysis)--> stereo ratio
        --(NSNet2 denoise, per channel)--> denoised[C, 24000]
        --(1024-pt no-overlap magnitude windows)--> bins[C, n_win, 513]
        --(speech-band volume + FSM scan)--> per-window events/segments

into ``chunk_step(carry, chunk) -> (carry, ChunkOutput)``: a jit-able,
vmap-able, scan-able pure function. Window accumulation across chunk
boundaries (the reference's SegmentWriter re-chunking) is handled with a
static-shape carry buffer and validity masks: each 24000-sample chunk
completes either 23 or 24 windows of 1024 samples.

Batch usage: ``vmap(chunk_step)`` over a leading stream axis, then
``lax.scan`` over time, then ``jit`` with sharding over the stream axis —
that is the entire TPU parallelization story for inference (the reference
uses one OS thread per stream, simulator.zig:221-232).  An additional
machine axis K on the FSM runs the reference's ``alt_vad_machine_configs``
parameter sweep over a single shared denoise/FFT stream.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VADConfig, VADMachineConfig
from ..models import nsnet2
from ..ops import dft, stft, volume, windows
from . import denoiser, fsm


class VADStatics(NamedTuple):
    sample_rate: int
    n_channels: int
    fft_size: int
    chunk_size: int  # denoiser chunk at pipeline rate (24000 @ 48k)
    max_windows: int  # max complete FFT windows per chunk (24 for defaults)
    min_bin: int  # speech band lower bin (inclusive)
    max_bin: int  # speech band upper bin (inclusive)
    norm_factor: float  # magnitude normalization (1/512 for hann-periodic 1024)
    downsample_rate: int
    fsm_shape: fsm.FSMShape
    fsm_params: fsm.FSMParams  # default machine parameters (pytree of scalars)


def statics_from_config(
    vad_config: VADConfig,
    sample_rate: int = 48000,
    n_channels: int = 2,
    machine_config: VADMachineConfig | None = None,
) -> VADStatics:
    if sample_rate != 48000:
        # The reference rejects any other rate (VADPipeline.zig:55-58).
        raise ValueError("only 48000 Hz input is supported")
    fft_size = vad_config.fft_size
    chunk = 24000
    cfg = machine_config if machine_config is not None else vad_config.vad_machine_config
    w = windows.hann_periodic(fft_size)
    nf = float(windows.window_norm_factor(w) / np.float32(fft_size))
    shape, params = fsm.statics_from_config(cfg, sample_rate, fft_size)
    return VADStatics(
        sample_rate=sample_rate,
        n_channels=n_channels,
        fft_size=fft_size,
        chunk_size=chunk,
        max_windows=chunk // fft_size + 1,
        min_bin=dft.freq_to_bin(cfg.speech_min_freq, fft_size, sample_rate),
        max_bin=dft.freq_to_bin(cfg.speech_max_freq, fft_size, sample_rate),
        norm_factor=nf,
        downsample_rate=sample_rate // 16000,
        fsm_shape=shape,
        fsm_params=params,
    )


def stack_machine_params(
    st: VADStatics, configs: Sequence[VADMachineConfig]
) -> fsm.FSMParams:
    """Stack K machine configs into one FSMParams with a leading K axis.

    All configs must share ring-buffer window sizes and speech band (the
    static shape); thresholds/durations may vary — this is the vmap form of
    the reference's alt_vad_machine_configs sweep.
    """
    all_params = []
    for cfg in configs:
        shape, params = fsm.statics_from_config(cfg, st.sample_rate, st.fft_size)
        if shape != st.fsm_shape:
            raise ValueError(
                "alt machine config changes ring-buffer sizes; run it as a "
                f"separate group (got {shape}, expected {st.fsm_shape})"
            )
        if (
            dft.freq_to_bin(cfg.speech_min_freq, st.fft_size, st.sample_rate) != st.min_bin
            or dft.freq_to_bin(cfg.speech_max_freq, st.fft_size, st.sample_rate) != st.max_bin
        ):
            raise ValueError("alt machine config changes the speech band")
        all_params.append(params)
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *all_params)


def init_carry(
    st: VADStatics, fsm_params: Optional[fsm.FSMParams] = None, dtype=jnp.float32
) -> dict[str, Any]:
    p = fsm_params if fsm_params is not None else st.fsm_params
    if np.ndim(p.threshold_factor) == 1:
        fsm_carry = jax.vmap(lambda pp: fsm.init_carry(st.fsm_shape, pp, dtype))(p)
    else:
        fsm_carry = fsm.init_carry(st.fsm_shape, p, dtype)
    return {
        "denoiser": denoiser.init_carry(st.n_channels, dtype),
        "fft_buf": jnp.zeros((st.n_channels, st.fft_size), dtype),  # right-aligned tail
        "fft_fill": jnp.int32(0),
        "prev_ratio": jnp.asarray(0.0, dtype),
        "win_base": jnp.int32(0),  # global index of the next completed window
        "fsm": fsm_carry,
    }


class ChunkOutput(NamedTuple):
    windows: fsm.WindowOutput  # per-window-slot FSM outputs, [max_windows] (+K axis if sweeping)
    window_valid: jnp.ndarray  # [max_windows] bool
    denoised: jnp.ndarray  # [C, chunk] denoised audio (for recording)
    min_vol: jnp.ndarray = None  # [max_windows] speech-band volume (FSM input)
    ratios: jnp.ndarray = None  # [max_windows] weighted channel ratio (FSM input)
    win_indices: jnp.ndarray = None  # [max_windows] global window indices


def _accumulate_windows(st: VADStatics, carry, denoised, shared_start=None):
    """Re-chunk denoised audio into fft_size windows across chunk boundaries.

    Returns (new_buf, new_fill, frames [C, max_windows, fft_size],
             n_windows, window_indices [max_windows], valid [max_windows]).

    shared_start: optional scalar overriding the carry-derived slice start.
    Under ``vmap`` with ``in_axes=None`` it stays UNBATCHED, so the framing
    lowers to one contiguous dynamic-slice of the whole batch instead of a
    per-row gather — measured 7.7 → ~4.6 ms of the B=1024 serving tick
    (benchmarks/tick_bisect.py). Callers must pass fft_size − fill of every
    valid stream (the server tracks fills host-side and falls back to the
    per-stream form when they diverge); outputs are bitwise-identical
    because the identical samples are read.
    """
    fft_size = st.fft_size
    fill = carry["fft_fill"]
    ext = jnp.concatenate([carry["fft_buf"], denoised], axis=-1)  # [C, fft+chunk]
    start = fft_size - fill if shared_start is None else shared_start
    n_windows = (fill + st.chunk_size) // fft_size

    w_range = jnp.arange(st.max_windows, dtype=jnp.int32)
    # Static-shape framing: one dynamic-slice at the (data-dependent) start
    # offset, then a static reshape. The previous form gathered with a
    # traced index tensor (`ext[..., idx]`), which XLA lowers to a real
    # gather — measured ~330 ms of a 365 ms online tick at B=1024 streams
    # (ROOFLINE.md "online tick"). Valid windows read exactly the same
    # samples (a valid window never reaches the padded tail), so outputs
    # are bitwise unchanged; invalid slots frame zero-padding instead of
    # clamp-duplicated garbage (masked downstream either way).
    frame_span = st.max_windows * fft_size
    ext_p = jnp.pad(ext, ((0, 0), (0, max(0, frame_span + fft_size - ext.shape[-1]))))
    frames = jax.lax.dynamic_slice_in_dim(ext_p, start, frame_span, axis=-1)
    frames = frames.reshape(ext.shape[0], st.max_windows, fft_size)

    valid = w_range < n_windows
    win_indices = carry["win_base"] + w_range
    new_fill = fill + st.chunk_size - n_windows * fft_size
    new_buf = ext[..., -fft_size:]
    return new_buf, new_fill, frames, n_windows, win_indices, valid


_WINDOW_CACHE: dict[int, np.ndarray] = {}


def _hann(fft_size: int) -> np.ndarray:
    if fft_size not in _WINDOW_CACHE:
        _WINDOW_CACHE[fft_size] = windows.hann_periodic(fft_size)
    return _WINDOW_CACHE[fft_size]


def chunk_step(
    params: nsnet2.NSNet2Params,
    st: VADStatics,
    carry: dict[str, Any],
    chunk: jnp.ndarray,
    chunk_valid: jnp.ndarray | bool = True,
    fsm_params: Optional[fsm.FSMParams] = None,
    run_fsm: bool = True,
    collect_denoised: bool = True,
    shared_start: Optional[jnp.ndarray] = None,
) -> tuple[dict[str, Any], ChunkOutput]:
    """Process one pipeline chunk for one stream.

    Args:
      chunk: [n_channels, chunk_size] original audio.
      chunk_valid: False for padding chunks (ragged batch tails): the carry is
        frozen and all outputs are masked invalid.
      fsm_params: override machine parameters; a leading K axis runs K state
        machines over the shared stream (carry["fsm"] must carry the K axis).
      run_fsm: False skips the FSM stage (ChunkOutput.windows is None and
        carry["fsm"] passes through untouched) — the host-FSM serving mode
        decodes the returned min_vol/ratios in native code instead
        (parallel/online.py; the vmapped in-device scan costs ~10x the rest
        of the tick at B=1024, ROOFLINE.md).
      collect_denoised: False returns a zero-width ``denoised`` ([C, 0]) —
        the events-only serving tier (parallel/online.py): decisions are
        identical (the denoised audio still feeds the FFT/band stages on
        device), but the [C, chunk] batch never round-trips HBM→host, so
        high-B serving drops ~192 KB/stream/tick of D2H and the matching
        device output buffer. Denoised recordings are unavailable then
        (the reference always keeps both streams, VADPipeline.zig:144-237).
      shared_start: see ``_accumulate_windows`` — lockstep-serving fast path
        where the window-framing slice offset is one unbatched scalar.
    Returns:
      (new_carry, ChunkOutput)
    """
    chunk_valid = jnp.asarray(chunk_valid)
    fsm_p = fsm_params if fsm_params is not None else st.fsm_params

    # 1. Stereo volume analysis on the original audio
    #    (BufferedVolumeAnalyzer.zig:48-69).
    cur_ratio, _vmin, _vmax = volume.volume_analysis(chunk)

    # 2. NSNet2 denoise per channel (BufferedDenoiser.zig:105-110).
    den_carry, denoised = denoiser.denoise_chunk(
        params, carry["denoiser"], chunk, st.downsample_rate
    )

    # 3. Re-chunk into 1024-pt windows; magnitude bins with 1/512 norm
    #    (BufferedFFT.zig:129-181).
    fill = carry["fft_fill"]
    new_buf, new_fill, frames, n_windows, win_indices, valid = _accumulate_windows(
        st, carry, denoised, shared_start
    )
    mags = stft.magnitude_windows(frames, _hann(st.fft_size), st.fft_size, st.norm_factor)

    # 4. Speech-band volume: SUM of magnitude bins in [min_bin, max_bin]
    #    (BufferedFFT.zig:183-202 "averageVolumeInBand" actually sums), then
    #    min over channels (VADMachine.zig:153-166).
    band = jnp.sum(mags[..., st.min_bin : st.max_bin + 1], axis=-1)  # [C, max_windows]
    min_vol = jnp.min(band, axis=0)  # [max_windows]

    # 5. Per-window weighted volume ratio: window 0 may straddle the previous
    #    chunk (VADMetadata sample-count weighting, VADMetadata.zig:29-60).
    f32fill = fill.astype(jnp.float32)
    w0_ratio = (f32fill * carry["prev_ratio"] + (st.fft_size - f32fill) * cur_ratio) / np.float32(
        st.fft_size
    )
    ratios = jnp.where(jnp.arange(st.max_windows) == 0, w0_ratio, cur_ratio)

    # 6. FSM scan over the window slots (VADMachine.zig:138-239).
    if run_fsm:
        fsm_carry, win_out = fsm.scan_windows(
            st.fsm_shape, fsm_p, carry["fsm"], min_vol, ratios, win_indices,
            valid & chunk_valid,
        )
    else:
        fsm_carry, win_out = carry["fsm"], None

    new_carry = {
        "denoiser": den_carry,
        "fft_buf": new_buf,
        "fft_fill": new_fill,
        "prev_ratio": cur_ratio,
        "win_base": carry["win_base"] + n_windows,
        "fsm": fsm_carry,
    }
    # Freeze everything on invalid chunks (the fsm carry is already frozen
    # per-window via `valid`, but denoiser/fft state must freeze too).
    new_carry = jax.tree_util.tree_map(
        lambda new, old: jnp.where(chunk_valid, new, old), new_carry, carry
    )

    out = ChunkOutput(
        windows=win_out,
        window_valid=valid & chunk_valid,
        denoised=denoised if collect_denoised else denoised[..., :0],
        min_vol=min_vol,
        ratios=ratios,
        win_indices=win_indices,
    )
    return new_carry, out


# ---------------------------------------------------------------------------
# Whole-stream processing (scan over chunks)
# ---------------------------------------------------------------------------


def process_stream(
    params: nsnet2.NSNet2Params,
    st: VADStatics,
    audio: jnp.ndarray,
    carry: dict[str, Any] | None = None,
    chunk_valids: jnp.ndarray | None = None,
    collect_denoised: bool = False,
    fsm_params: Optional[fsm.FSMParams] = None,
):
    """Run the VAD over a whole stream.

    Args:
      audio: [C, T] with T a multiple of chunk_size (callers truncate the tail,
        matching the reference which never processes a partial denoiser chunk,
        VADPipeline.zig:149-151).
      chunk_valids: optional [T // chunk_size] bool mask for padded chunks.
      collect_denoised: also return the full denoised audio (memory-heavy).
    Returns:
      (final_carry, ChunkOutput stacked over chunks) — windows fields have
      shape [n_chunks, max_windows] (or [n_chunks, max_windows, K]).
    """
    c, t = audio.shape
    n_chunks = t // st.chunk_size
    chunks = audio[:, : n_chunks * st.chunk_size].reshape(c, n_chunks, st.chunk_size)
    chunks = jnp.moveaxis(chunks, 1, 0)  # [n_chunks, C, chunk]
    if carry is None:
        carry = init_carry(st, fsm_params)
    if chunk_valids is None:
        chunk_valids = jnp.ones((n_chunks,), bool)

    def body(cr, xs):
        ch, cv = xs
        cr, out = chunk_step(params, st, cr, ch, cv, fsm_params)
        if not collect_denoised:
            out = out._replace(denoised=jnp.zeros((0,), out.denoised.dtype))
        return cr, out

    return jax.lax.scan(body, carry, (chunks, chunk_valids))


def segments_from_outputs(st: VADStatics, outputs: ChunkOutput) -> list[dict]:
    """Host-side: convert stacked ChunkOutput into speech segments.

    Applies the +/-2 s recording margins (VADMachine.zig:312-325) to produce
    ``sample_from``/``sample_to`` like VADPipeline.SpeechSegment
    (VADPipeline.zig:28-33).
    """
    # The +/-2 s margin is hardcoded in the reference regardless of config
    # (VADMachine.zig:312-325).
    margin = VADMachineConfig().recording_margin_samples(st.sample_rate)
    win = np.asarray(outputs.windows.seg_valid).reshape(-1)
    starts = np.asarray(outputs.windows.seg_start_win).reshape(-1)
    ends = np.asarray(outputs.windows.seg_end_win).reshape(-1)
    ratios = np.asarray(outputs.windows.seg_ratio).reshape(-1)
    mets = np.asarray(outputs.windows.seg_met_sec).reshape(-1)
    segs = []
    for i in np.nonzero(win)[0]:
        s = int(starts[i]) * st.fft_size
        e = int(ends[i]) * st.fft_size
        segs.append(
            {
                "sample_from": max(0, s - margin),
                "sample_to": e + margin,
                "avg_channel_vol_ratio": float(ratios[i]),
                "vad_met_sec": float(mets[i]),
            }
        )
    return segs
