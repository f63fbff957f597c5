"""Multiplexed streaming daemon — N radios in one process, one device batch.

The reference daemon (src/main.zig) serves exactly one stream per process;
scaling a race weekend means a process per driver with no MXU amortization.
This daemon multiplexes the same newline-JSON protocol over N named streams
and runs their device compute through ONE batched step per 0.5 s tick
(``parallel.online.OnlineBatchServer``).

Protocol (the reference's, plus a required ``stream`` field):

* stdin:  ``{"action": "segment", "stream": NAME, "file_path": ...,
  "playhead_timestamp_ms": ...}`` and
  ``{"action": "skip_segment", "stream": NAME}`` (silence of the previous
  segment's length, preserving sample continuity — main.zig:283-301).
* stdout: the reference's ``recording``/``error`` events, each carrying a
  ``stream`` field; recordings land under ``OUTDIR/<stream>/``.

Streams feed at their own pace: a device tick advances exactly the streams
holding >= one full chunk (0.5 s) of buffered audio; the others' carried
state is frozen on device and resumes untouched. Audio below one chunk
stays buffered until more arrives (like the reference, trailing partial
chunks are never processed).

Usage:
  python -m formula_vad_tpu.apps.multidaemon -o OUTDIR -n NAME \
      --streams perez,sainz,alonso [--denoiser MODEL] [--precision P]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys

import numpy as np

from ..config import PipelineConfig, VADConfig
from ..io_.audio import AudioBuffer
from ..models.registry import load_denoiser
from ..pipeline.pipeline import Callbacks


class MultiDaemon:
    def __init__(
        self,
        name: str,
        out_dir: str,
        streams: list[str],
        denoiser_path: str | None = None,
        stdout=None,
    ):
        from ..parallel.online import OnlineBatchServer

        if len(set(streams)) != len(streams) or not streams:
            raise ValueError("streams must be a non-empty list of unique names")
        self.name = name
        self.out_dir = out_dir
        self.stdout = stdout or sys.stdout
        self.streams = list(streams)
        self.index = {s: i for i, s in enumerate(self.streams)}
        b = len(streams)

        config = PipelineConfig(
            sample_rate=48000,
            n_channels=2,
            buffer_length=48000 * 10,
            vad_config=VADConfig(denoiser_model_path=denoiser_path),
        )
        self.config = config
        callbacks = [
            Callbacks(
                on_original_recording=lambda buf, i=i: self._on_recording(i, buf, "original"),
                on_denoised_recording=lambda buf, i=i: self._on_recording(i, buf, "denoised"),
            )
            for i in range(b)
        ]
        for s in streams:
            os.makedirs(os.path.join(out_dir, s), exist_ok=True)
        self.server = OnlineBatchServer(
            config, b, params=load_denoiser(denoiser_path), callbacks=callbacks
        )
        self.chunk = self.server.chunk_size

        # Per-stream host state: pending-sample FIFO + playhead correlation.
        self._pending: list[collections.deque] = [collections.deque() for _ in range(b)]
        self._pending_len = [0] * b
        self.correlated_sample_index = [0] * b
        self.correlated_timestamp_ms = [0] * b
        self.last_segment_length = [0] * b
        self._enqueued = [0] * b

    # ---- output ------------------------------------------------------------

    def _emit(self, obj: dict) -> None:
        self.stdout.write(json.dumps(obj) + "\n")
        self.stdout.flush()

    def report_error(self, message: str, fatal: bool, stream: str | None = None) -> None:
        ev = {"action": "error", "message": message, "fatal": fatal}
        if stream is not None:
            ev["stream"] = stream
        self._emit(ev)

    def _on_recording(self, i: int, buf: AudioBuffer, kind: str) -> None:
        stream = self.streams[i]
        path = os.path.join(self.out_dir, stream, f"{buf.global_start_frame_number}-{kind}.wav")
        try:
            buf.save_to_file(path)
        except OSError as e:
            self.report_error(f"Error saving audio file: {e}. Path: {path}", False, stream)
            return
        if kind != "original":  # only originals are announced (main.zig:367-370)
            return
        duration_ms = int(buf.duration_seconds * 1000)
        samples_since = buf.global_start_frame_number - self.correlated_sample_index[i]
        ms_since = (1000 * samples_since) // buf.sample_rate if samples_since >= 0 else -(
            (1000 * -samples_since) // buf.sample_rate
        )
        self._emit(
            {
                "action": "recording",
                "name": self.name,
                "stream": stream,
                "file_path": path,
                "playhead_timestamp_ms": self.correlated_timestamp_ms[i] + ms_since,
                "duration_ms": duration_ms,
                "speech_duration_ms": duration_ms - min(duration_ms, 3500),
            }
        )

    # ---- ticking -----------------------------------------------------------

    def _enqueue(self, i: int, samples: np.ndarray) -> None:
        if samples.shape[1]:
            self._pending[i].append(np.asarray(samples, np.float32))
            self._pending_len[i] += samples.shape[1]
        self._enqueued[i] += samples.shape[1]

    def _pop_chunk(self, i: int) -> np.ndarray:
        parts = []
        need = self.chunk
        while need > 0:
            head = self._pending[i][0]
            if head.shape[1] <= need:
                parts.append(self._pending[i].popleft())
                need -= head.shape[1]
            else:
                parts.append(head[:, :need])
                self._pending[i][0] = head[:, need:]
                need = 0
        self._pending_len[i] -= self.chunk
        return np.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    def tick_while_ready(self) -> None:
        """Advance the batch while ANY stream holds a full chunk."""
        b = len(self.streams)
        zeros = np.zeros((self.config.n_channels, self.chunk), np.float32)
        while True:
            valid = np.array([self._pending_len[i] >= self.chunk for i in range(b)])
            if not valid.any():
                return
            chunks = np.stack(
                [self._pop_chunk(i) if valid[i] else zeros for i in range(b)]
            )
            self.server.push(chunks, valid=valid)

    # ---- commands ----------------------------------------------------------

    def process_line(self, line: str) -> None:
        line = line.strip()
        if not line:
            return
        try:
            cmd = json.loads(line)
        except json.JSONDecodeError as e:
            self.report_error(f"Error parsing command JSON: {e}. Line: {line}", False)
            return
        stream = cmd.get("stream")
        if stream not in self.index:
            self.report_error(
                f"Unknown or missing stream {stream!r} (serving {self.streams}). "
                f"Command: {cmd}",
                False,
            )
            return
        i = self.index[stream]
        action = cmd.get("action")
        if action == "segment":
            self._process_segment(i, cmd)
        elif action == "skip_segment":
            self._process_skip(i)
        else:
            self.report_error(f"Unknown action: {action}", False, stream)
        self.tick_while_ready()

    def _process_segment(self, i: int, cmd: dict) -> None:
        stream = self.streams[i]
        file_path = cmd.get("file_path")
        playhead = cmd.get("playhead_timestamp_ms")
        if file_path is None or playhead is None:
            self.report_error(
                f"Missing file_path or playhead_timestamp_ms in command: {cmd}",
                False, stream,
            )
            return
        try:
            buffer = AudioBuffer.load_from_file(file_path)
        except (OSError, ValueError, RuntimeError) as e:
            self.report_error(f"Error loading audio file: {e}. Command: {cmd}", False, stream)
            return
        if buffer.n_channels != self.config.n_channels:
            self.report_error(
                f"Audio file has {buffer.n_channels} channels, but pipeline has "
                f"{self.config.n_channels} channels. Command: {cmd}",
                False, stream,
            )
            self._process_skip(i)
            return
        if buffer.sample_rate != self.config.sample_rate:
            self.report_error(
                f"Audio file has SR of {buffer.sample_rate}, but pipeline has SR of "
                f"{self.config.sample_rate}. Command: {cmd}",
                True, stream,
            )
            raise SystemExit(1)  # fatal (main.zig:259-270)
        # Reference ordering (main.zig:273-281): the correlation updates
        # AFTER the push completes, so recordings fired while processing
        # THIS file still use the previous correlation point.
        first_idx = self._enqueued[i]
        self._enqueue(i, buffer.channel_pcm)
        self.tick_while_ready()
        self.correlated_sample_index[i] = first_idx
        self.correlated_timestamp_ms[i] = playhead
        self.last_segment_length[i] = buffer.length

    def _process_skip(self, i: int) -> None:
        self._enqueue(
            i, np.zeros((self.config.n_channels, self.last_segment_length[i]), np.float32)
        )

    def run(self, stdin=None) -> int:
        stdin = stdin or sys.stdin
        for line in stdin:
            self.process_line(line)
        return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Multiplexed Formula-VAD daemon.")
    ap.add_argument("-o", "--outdir", required=True, help="Output directory")
    ap.add_argument("-n", "--name", required=True, help="Daemon name for events")
    ap.add_argument(
        "--streams", required=True,
        help="Comma-separated stream names (one VAD state per stream)",
    )
    ap.add_argument("--denoiser", default=None, help="Denoiser spec (see apps.daemon)")
    ap.add_argument(
        "--precision", choices=("highest", "high", "default"), default=None,
        help="Matmul precision (see PARITY.md #2)",
    )
    args = ap.parse_args(argv)
    if args.precision:
        from ..ops.precision import set_matmul_precision

        set_matmul_precision(args.precision)
    if not os.path.isdir(args.outdir) or not os.access(args.outdir, os.W_OK):
        sys.stdout.write(
            json.dumps(
                {
                    "action": "error",
                    "message": f"Output directory {args.outdir} isn't writeable",
                    "fatal": True,
                }
            )
            + "\n"
        )
        return 2
    daemon = MultiDaemon(
        args.name, args.outdir, [s for s in args.streams.split(",") if s], args.denoiser
    )
    return daemon.run()


if __name__ == "__main__":
    sys.exit(main())
