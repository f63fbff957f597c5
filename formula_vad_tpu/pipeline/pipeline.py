"""Host-side streaming AudioPipeline.

The online/daemon counterpart of the batch runner: wraps the pure device
``chunk_step`` with host state — pending-sample buffering, ring buffers of
original and denoised audio, and ring-aware recorders — mirroring the
reference's ``src/AudioPipeline.zig`` + ``MRBRecorder.zig`` + ``Recorder.zig``:

* ``push_samples`` accepts arbitrary-length planar PCM and runs the device
  step once per complete 24000-sample chunk (the reference's half-capacity
  write-then-process cadence, AudioPipeline.zig:118-143, collapses to this
  because the VAD consumes whole denoiser chunks).
* Recording ``started`` events may point up to 2 s into the past (the start
  margin) — served from the ring buffer; ``completed`` events point 2 s into
  the future — finalization is deferred until enough samples arrive
  (MRBRecorder.zig:88-112,172-203).
* Finalized recordings select the quietest channel (least engine noise,
  Recorder.zig:113-128) and emit a mono AudioBuffer stamped with the global
  start frame, via callbacks (AudioPipeline.zig:14-18,193-209).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..io_.audio import AudioBuffer
from ..models import nsnet2
from . import fsm, vad


class RingBuffer:
    """N-channel ring buffer with monotonic absolute indexing
    (structures/MultiRingBuffer.zig)."""

    def __init__(self, n_channels: int, capacity: int):
        self.data = np.zeros((n_channels, capacity), np.float32)
        self.capacity = capacity
        self.total_written = 0

    def write(self, samples: np.ndarray) -> None:
        n = samples.shape[1]
        if n >= self.capacity:
            # Keep only the tail, placed so absolute indexing stays aligned.
            tail = samples[:, -self.capacity :]
            pos = (self.total_written + n - self.capacity) % self.capacity
            k = self.capacity - pos
            self.data[:, pos:] = tail[:, :k]
            self.data[:, :pos] = tail[:, k:]
            self.total_written += n
            return
        pos = self.total_written % self.capacity
        end = pos + n
        if end <= self.capacity:
            self.data[:, pos:end] = samples
        else:
            k = self.capacity - pos
            self.data[:, pos:] = samples[:, :k]
            self.data[:, : end - self.capacity] = samples[:, k:]
        self.total_written += n

    def read(self, abs_from: int, abs_to: int) -> np.ndarray:
        """Read [abs_from, abs_to) by absolute sample index (must be resident)."""
        if abs_from < self.total_written - self.capacity or abs_to > self.total_written:
            raise IndexError(
                f"range [{abs_from}, {abs_to}) not resident "
                f"(written {self.total_written}, capacity {self.capacity})"
            )
        idx = np.arange(abs_from, abs_to) % self.capacity
        return self.data[:, idx]


class StreamRecorder:
    """Ring-aware recorder with deferred finalization (MRBRecorder.zig)."""

    def __init__(self, ring: RingBuffer, sample_rate: int):
        self.ring = ring
        self.sample_rate = sample_rate
        self.recording = False
        self.start_index = 0
        self.buffer: Optional[np.ndarray] = None  # [C, n] accumulated
        self.stop_at: Optional[int] = None
        self.keep = True

    def start(self, from_sample: int) -> None:
        from_sample = max(from_sample, self.ring.total_written - self.ring.capacity)
        self.recording = True
        self.start_index = from_sample
        self.buffer = self.ring.read(from_sample, self.ring.total_written)
        self.stop_at = None

    def on_new_samples(self, samples: np.ndarray) -> Optional[AudioBuffer]:
        """Called after each ring write; appends and maybe finalizes."""
        if not self.recording:
            return None
        self.buffer = np.concatenate([self.buffer, samples], axis=1)
        if self.stop_at is not None and self.ring.total_written >= self.stop_at:
            return self._finalize()
        return None

    def stop(self, to_sample: int, keep: bool) -> Optional[AudioBuffer]:
        """Request stop at a (possibly future) absolute index."""
        if not self.recording:
            return None
        self.keep = keep
        if not keep:
            self.recording = False
            self.buffer = None
            return None
        if self.ring.total_written >= to_sample:
            self.stop_at = to_sample
            return self._finalize()
        self.stop_at = to_sample  # deferred (MRBRecorder.zig:88-112)
        return None

    def _finalize(self) -> Optional[AudioBuffer]:
        from ..io_ import native

        n_keep = self.stop_at - self.start_index
        data = np.ascontiguousarray(self.buffer[:, :n_keep], np.float32)
        self.recording = False
        self.buffer = None
        # Quietest channel = least engine noise (Recorder.zig:113-128).
        rms = native.rms_per_channel(data)
        if rms is None:
            rms = np.sqrt(np.mean(data.astype(np.float64) ** 2, axis=1))
        best = int(np.argmin(rms))
        return AudioBuffer(
            channel_pcm=data[best : best + 1].copy(),
            sample_rate=self.sample_rate,
            global_start_frame_number=self.start_index,
        )


@dataclasses.dataclass
class Callbacks:
    """AudioPipeline.Callbacks (AudioPipeline.zig:14-18)."""

    on_original_recording: Optional[Callable[[AudioBuffer], None]] = None
    on_denoised_recording: Optional[Callable[[AudioBuffer], None]] = None
    on_segment: Optional[Callable[[dict], None]] = None  # extension: segment events


class AudioPipeline:
    """Streaming host pipeline for one audio stream."""

    def __init__(
        self,
        config: PipelineConfig,
        params: Optional[nsnet2.NSNet2Params] = None,
        callbacks: Optional[Callbacks] = None,
        *,
        statics: Optional[vad.VADStatics] = None,
        server_managed: bool = False,
    ):
        """server_managed=True skips the per-stream device carry and solo
        jitted step: the stream's device compute runs in a shared batched
        step (parallel/online.py) and results arrive via
        ``ingest_processed_chunk``. ``statics`` shares one precomputed
        VADStatics across many pipelines."""
        self.config = config
        self.callbacks = callbacks or Callbacks()
        if params is None:
            from ..models.registry import load_denoiser

            params = load_denoiser(config.vad_config.denoiser_model_path)
        self.params = params
        self.st = statics if statics is not None else vad.statics_from_config(
            config.vad_config, config.sample_rate, config.n_channels
        )
        self.chunk_size = self.st.chunk_size
        cap = config.resolved_buffer_length
        self.original_ring = RingBuffer(config.n_channels, cap)
        self.denoised_ring = RingBuffer(config.n_channels, cap)
        self.original_recorder = StreamRecorder(self.original_ring, config.sample_rate)
        self.denoised_recorder = StreamRecorder(self.denoised_ring, config.sample_rate)
        # Samples consumed by the VAD so far (VADPipeline.pipeline_read_count).
        self._read_count = 0
        if server_managed:
            self._carry = None
            self._step = None
        else:
            self._carry = vad.init_carry(self.st)
            self._step = jax.jit(
                lambda carry, chunk: vad.chunk_step(self.params, self.st, carry, chunk)
            )
        self.segments: list[dict] = []
        self._margin = 2 * config.sample_rate

        # Alternative state machines (parameter sweeps, VADPipeline.zig:
        # 111-123, 232-236): K extra FSMs consume the same window stream;
        # only their segments are collected (no recordings).
        alt = config.vad_config.alt_vad_machine_configs
        self._alt_params = (
            vad.stack_machine_params(self.st, alt) if alt else None
        )
        self.alt_segments: list[list[dict]] = [[] for _ in (alt or ())]
        if self._alt_params is not None:
            self._alt_carry = jax.vmap(
                lambda p: fsm.init_carry(self.st.fsm_shape, p)
            )(self._alt_params)
            shape = self.st.fsm_shape
            alt_params = self._alt_params

            def alt_step(carry, mv, rt, wi, va):
                def body(c, xs):
                    mv1, rt1, wi1, va1 = xs
                    return jax.vmap(
                        lambda p, cc: fsm.step_window(shape, p, cc, mv1, rt1, wi1, va1)
                    )(alt_params, c)

                return jax.lax.scan(body, carry, (mv, rt, wi, va))

            self._alt_step = jax.jit(alt_step)

    @property
    def total_write_count(self) -> int:
        return self.original_ring.total_written

    def push_samples(self, channel_pcm: np.ndarray) -> int:
        """Push planar [C, n] samples; runs the device step per full unread
        chunk. All samples land in the original ring immediately (the
        reference writes in capacity/2 slabs then processes,
        AudioPipeline.zig:118-143; the VAD's read count trails behind).
        Returns the absolute index of the first pushed sample."""
        channel_pcm = np.asarray(channel_pcm, np.float32)
        if channel_pcm.shape[0] != self.config.n_channels:
            raise ValueError(
                f"expected {self.config.n_channels} channels, got {channel_pcm.shape[0]}"
            )
        first_index = self.original_ring.total_written
        # Write in slabs no larger than half the ring so the VAD never falls
        # a full ring behind the writer (the reference's write cadence).
        slab = self.original_ring.capacity // 2
        pos = 0
        n = channel_pcm.shape[1]
        while pos < n:
            part = channel_pcm[:, pos : pos + slab]
            pos += part.shape[1]
            self._write_and_record(
                self.original_ring, self.original_recorder, part, "original"
            )
            self._maybe_run_pipeline()
        return first_index

    def _maybe_run_pipeline(self) -> None:
        if self.config.skip_processing:
            self._read_count = self.original_ring.total_written
            return
        while self.original_ring.total_written - self._read_count >= self.chunk_size:
            chunk = self.original_ring.read(self._read_count, self._read_count + self.chunk_size)
            self._read_count += self.chunk_size
            self._process_chunk(chunk)

    def _process_chunk(self, chunk: np.ndarray) -> None:
        if self._step is None:
            raise RuntimeError(
                "pipeline is server-managed: feed it through "
                "OnlineBatchServer.push, not push_samples"
            )
        self._carry, out = self._step(self._carry, jnp.asarray(chunk))
        self._consume_chunk_output(out)

    def ingest_processed_chunk(self, chunk: np.ndarray, out) -> None:
        """Server mode (parallel/online.py): ring writes + host-side event
        assembly for one chunk whose DEVICE compute already ran in a shared
        batched step. Keeps this pipeline's counters/recorders/segments in
        exactly the state push_samples would have produced."""
        chunk = np.asarray(chunk, np.float32)
        self._write_and_record(
            self.original_ring, self.original_recorder, chunk, "original"
        )
        self._read_count += chunk.shape[1]
        self._consume_chunk_output(out)

    # ---- server mode, ring-buffered ingestion (multidaemon) ---------------
    # The solo push_samples path writes ALL samples into the original ring
    # immediately (trailing sub-chunk samples included — the reference's
    # AudioPipeline.zig:118-143 cadence) and lets the VAD read count trail.
    # These three methods expose the same split for a shared batched device
    # step: buffer_samples = the write phase, peek/complete = the process
    # phase driven externally (OnlineBatchServer.tick_pending).

    def buffer_samples(self, channel_pcm: np.ndarray) -> int:
        """Write samples into the original ring + recorder WITHOUT running
        the device step; returns the absolute index of the first sample.
        Callers must interleave ticking so no more than ring capacity of
        samples is ever unprocessed (the solo path's capacity/2 cadence)."""
        channel_pcm = np.asarray(channel_pcm, np.float32)
        unread = self.original_ring.total_written - self._read_count
        if unread + channel_pcm.shape[1] > self.original_ring.capacity:
            raise ValueError(
                "buffer_samples would overwrite unprocessed audio: tick the "
                "server between slabs (see OnlineBatchServer.tick_pending)"
            )
        first_index = self.original_ring.total_written
        self._write_and_record(
            self.original_ring, self.original_recorder, channel_pcm, "original"
        )
        return first_index

    @property
    def pending_chunks(self) -> int:
        """Full unprocessed chunks sitting in the original ring."""
        return (self.original_ring.total_written - self._read_count) // self.chunk_size

    def peek_pending_chunk(self) -> np.ndarray:
        """The next unprocessed chunk (does not advance the read count)."""
        return self.original_ring.read(
            self._read_count, self._read_count + self.chunk_size
        )

    def complete_chunk(self, out) -> None:
        """Advance past the chunk last peeked and consume its device output."""
        self._read_count += self.chunk_size
        self._consume_chunk_output(out)

    def _consume_chunk_output(self, out) -> None:
        if self._alt_params is not None:
            self._alt_carry, alt_out = self._alt_step(
                self._alt_carry, out.min_vol, out.ratios, out.win_indices,
                out.window_valid,
            )
            seg_valid = np.asarray(alt_out.seg_valid)  # [slots, K]
            for w, kk in zip(*np.nonzero(seg_valid)):
                seg = vad.segments_from_outputs(
                    self.st,
                    vad.ChunkOutput(
                        windows=jax.tree_util.tree_map(
                            lambda x: np.asarray(x)[None, w, kk], alt_out
                        ),
                        window_valid=None,
                        denoised=None,
                    ),
                )
                if seg:
                    self.alt_segments[kk].append(seg[0])
        denoised = np.asarray(out.denoised)
        # Events-only serving tier (chunk_step collect_denoised=False): the
        # denoised batch never left the device, so the denoised ring and
        # recorder are inactive for this stream — original recordings and
        # all segment events still work from host-side audio.
        has_denoised = denoised.size > 0
        if has_denoised:
            # The denoised ring is written before event handling so started-
            # recordings can read their pre-roll.
            self._write_and_record(self.denoised_ring, self.denoised_recorder, denoised, "denoised")

        events = np.asarray(out.windows.event)
        payloads = np.asarray(out.windows.event_win)
        valid = np.asarray(out.window_valid)
        seg_valid = np.asarray(out.windows.seg_valid)
        for w in range(events.shape[0]):
            if not valid[w]:
                continue
            ev = int(events[w])
            if ev == fsm.EV_STARTED:
                start = max(0, int(payloads[w]) * self.st.fft_size - self._margin)
                self.original_recorder.start(start)
                if has_denoised:
                    self.denoised_recorder.start(start)
            elif ev == fsm.EV_COMPLETED:
                stop = int(payloads[w]) * self.st.fft_size + self._margin
                self._emit(self.original_recorder.stop(stop, True), "original")
                if has_denoised:
                    self._emit(self.denoised_recorder.stop(stop, True), "denoised")
                if seg_valid[w]:
                    seg_out = jax.tree_util.tree_map(lambda x: np.asarray(x)[None, w], out.windows)
                    seg = vad.segments_from_outputs(
                        self.st, vad.ChunkOutput(seg_out, None, None)
                    )
                    if seg:
                        self.segments.append(seg[0])
                        if self.callbacks.on_segment:
                            self.callbacks.on_segment(seg[0])
            elif ev == fsm.EV_ABORTED:
                self.original_recorder.stop(0, False)
                self.denoised_recorder.stop(0, False)

    def _write_and_record(self, ring, recorder, samples, kind) -> None:
        ring.write(samples)
        buf = recorder.on_new_samples(samples)
        self._emit(buf, kind)

    # ---- checkpoint / resume (no reference equivalent: SURVEY.md §5 notes
    # the reference loses all state on exit) --------------------------------

    def save_state(self, path: str) -> None:
        """Serialize the full streaming state (device carry + alt-machine
        carries + rings + counters + in-flight recorder state) so a
        restarted process resumes bit-identically — including recordings
        that were active at checkpoint time (their accumulated buffers ride
        in a ``<path>.rec.npz`` sidecar, since they are variable-length and
        may outlive the ring's history). Host counters are stored as true
        numpy int64 (NOT jnp — JAX's x64-disabled mode would truncate a
        >2^31-sample daemon stream, ~12 h at 48 kHz)."""
        from ..utils import checkpoint

        rec = {}
        for prefix, r in (
            ("orig", self.original_recorder),
            ("den", self.denoised_recorder),
        ):
            rec[f"{prefix}_recording"] = np.bool_(r.recording)
            rec[f"{prefix}_start"] = np.int64(r.start_index)
            rec[f"{prefix}_stop_at"] = np.int64(-1 if r.stop_at is None else r.stop_at)
            rec[f"{prefix}_keep"] = np.bool_(r.keep)
            rec[f"{prefix}_buffer"] = (
                r.buffer
                if r.buffer is not None
                else np.zeros((self.config.n_channels, 0), np.float32)
            )
        np.savez(path + ".rec.npz", **rec)

        state = {
            # Server-managed pipelines have no solo carry (the server's
            # batched carries file is authoritative); save a placeholder so
            # the file layout stays uniform.
            "carry": self._carry if self._carry is not None else vad.init_carry(self.st),
            # np scalars survive save/load exactly (no jnp round-trip)
            "read_count": np.int64(self._read_count),
            "orig_ring": np.asarray(self.original_ring.data),
            "orig_written": np.int64(self.original_ring.total_written),
            "den_ring": np.asarray(self.denoised_ring.data),
            "den_written": np.int64(self.denoised_ring.total_written),
        }
        if self._alt_params is not None:
            state["alt_carry"] = self._alt_carry
        checkpoint.save_carry(path, state)

    def _state_template(self) -> dict:
        template = {
            "carry": vad.init_carry(self.st),
            "read_count": np.int64(0),
            "orig_ring": np.zeros_like(self.original_ring.data),
            "orig_written": np.int64(0),
            "den_ring": np.zeros_like(self.denoised_ring.data),
            "den_written": np.int64(0),
        }
        if self._alt_params is not None:
            template["alt_carry"] = self._alt_carry
        return template

    def load_state(self, path: str) -> None:
        from ..utils import checkpoint

        state = checkpoint.load_carry(path, self._state_template())
        self._carry = state["carry"]
        if self._alt_params is not None:
            self._alt_carry = state["alt_carry"]
        self._read_count = int(state["read_count"])
        self.original_ring.data = np.array(state["orig_ring"])  # writable copy
        self.original_ring.total_written = int(state["orig_written"])
        self.denoised_ring.data = np.array(state["den_ring"])  # writable copy
        self.denoised_ring.total_written = int(state["den_written"])

        rec_path = path + ".rec.npz"
        if os.path.exists(rec_path):
            z = np.load(rec_path)
            for prefix, r in (
                ("orig", self.original_recorder),
                ("den", self.denoised_recorder),
            ):
                r.recording = bool(z[f"{prefix}_recording"])
                r.start_index = int(z[f"{prefix}_start"])
                stop_at = int(z[f"{prefix}_stop_at"])
                r.stop_at = None if stop_at < 0 else stop_at
                r.keep = bool(z[f"{prefix}_keep"])
                r.buffer = np.array(z[f"{prefix}_buffer"]) if r.recording else None

    def _emit(self, buf: Optional[AudioBuffer], kind: str) -> None:
        if buf is None:
            return
        cb = (
            self.callbacks.on_original_recording
            if kind == "original"
            else self.callbacks.on_denoised_recording
        )
        if cb:
            cb(buf)
