"""Online multi-stream serving demo: N synthetic radios through ONE batched
device step per 0.5 s tick (parallel/online.py::OnlineBatchServer).

Simulates a live race: every tick each stream contributes its next 0.5 s of
audio; detected-speech recordings are written per stream as they complete,
and per-tick wall time is reported against the 500 ms real-time budget.

    python examples/serve_many.py --streams 8 --seconds 60 --out /tmp/serve_out
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_synthetic_corpus import synth_stream  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--out", default=None, help="Directory for per-stream recordings")
    ap.add_argument("--denoiser", default=None, help="Denoiser spec (default: demo when packaged)")
    ap.add_argument(
        "--events-only",
        action="store_true",
        help="High-density tier: denoised audio never leaves the device "
        "(segments + original recordings only; see OnlineBatchServer)",
    )
    args = ap.parse_args(argv)

    from formula_vad_tpu.config import PipelineConfig, VADConfig, VADMachineConfig
    from formula_vad_tpu.parallel.online import OnlineBatchServer
    from formula_vad_tpu.pipeline.pipeline import Callbacks

    rng = np.random.default_rng(0)
    audios = []
    for i in range(args.streams):
        audio, labels = synth_stream(rng, args.seconds)
        audios.append(audio)
        print(f"stream {i}: {len(labels)} speech bursts")

    callbacks = None
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        from formula_vad_tpu.io_.wav import write_wav

        def make_cb(i):
            d = os.path.join(args.out, f"stream{i:02d}")
            os.makedirs(d, exist_ok=True)

            def on_rec(buf):
                path = os.path.join(d, f"{buf.global_start_frame_number}-original.wav")
                write_wav(path, buf.channel_pcm, buf.sample_rate)
                print(f"  [stream {i}] recording -> {path}")

            return Callbacks(on_original_recording=on_rec)

        callbacks = [make_cb(i) for i in range(args.streams)]

    config = PipelineConfig(
        vad_config=VADConfig(
            denoiser_model_path=args.denoiser,
            vad_machine_config=VADMachineConfig(long_term_speech_avg_sec=30.0),
        )
    )
    server = OnlineBatchServer(
        config, args.streams, callbacks=callbacks,
        collect_denoised=not args.events_only,
    )
    chunk = server.chunk_size
    n_ticks = int(args.seconds * 48000) // chunk

    tick_times = []
    for k in range(n_ticks):
        chunks = np.stack([a[:, k * chunk : (k + 1) * chunk] for a in audios])
        t0 = time.perf_counter()
        server.push(chunks)
        tick_times.append(time.perf_counter() - t0)

    total_segs = sum(len(s) for s in server.segments)
    tt = np.asarray(tick_times[2:])  # skip compile ticks
    print(f"\n{args.streams} streams x {n_ticks} ticks: {total_segs} segments", end="")
    if tt.size:
        print(
            f"; tick p50 {np.median(tt)*1e3:.1f} ms / "
            f"p99 {np.quantile(tt, 0.99)*1e3:.1f} ms (budget 500 ms)"
        )
    else:
        print(" (run >= 2 s of audio for tick statistics)")
    # The server tracks the same thing itself (device step + decode, without
    # this loop's input slicing): the multidaemon exposes it as the "stats"
    # protocol action.
    print(f"server.tick_stats(): {server.tick_stats()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
