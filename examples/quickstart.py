"""Library-API quickstart: push audio in, get speech segments + clips out.

The 40-line tour of what the reference's `linkPackage` consumers get from
`src/package.zig:1-3` (AudioPipeline + audio utils), as a Python library:
synthesize 30 s of radio-style audio, stream it through `AudioPipeline` in
1 s pushes (exactly how a live caller would — AudioPipeline.zig:118-143),
print the detected segments, save each detection as a WAV clip, and score
the run against the known labels.

    python examples/quickstart.py [--out /tmp/quickstart] [--cpu]

Everything here also works batched (parallel.runner.BatchRunner) and as a
B-stream server (parallel.online.OnlineBatchServer) — see serve_many.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_synthetic_corpus import synth_stream  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default=None, help="Directory for detection clips")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--cpu", action="store_true",
                    help="Force CPU (useful where the TPU sits behind a slow tunnel)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from formula_vad_tpu.config import PipelineConfig, VADConfig
    from formula_vad_tpu.eval import SpeechSegment, init_and_run, statistics
    from formula_vad_tpu.io_.wav import write_wav
    from formula_vad_tpu.models.registry import load_denoiser
    from formula_vad_tpu.pipeline.pipeline import AudioPipeline, Callbacks

    # 1. Audio: any 48 kHz stereo float32 [2, T] works; here, a synthetic
    #    radio stream with known speech labels.
    audio, labels = synth_stream(np.random.default_rng(0), args.seconds)

    # 2. Pipeline: packaged demo NSNet2 weights; clips arrive via callbacks
    #    (the quietest channel, mono — Recorder.zig:113-128 semantics).
    clips = []

    def on_clip(buf):
        clips.append(buf)
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            path = os.path.join(args.out, f"{buf.global_start_frame_number}-denoised.wav")
            write_wav(path, buf.channel_pcm, buf.sample_rate)
            print(f"  clip saved: {path}")

    pipe = AudioPipeline(
        PipelineConfig(sample_rate=48000, n_channels=2, vad_config=VADConfig()),
        params=load_denoiser(None),  # demo weights; or "path/to/model.onnx"
        callbacks=Callbacks(on_denoised_recording=on_clip),
    )

    # 3. Stream it in 1 s pushes, like a live caller.
    for start in range(0, audio.shape[1], 48000):
        pipe.push_samples(audio[:, start : start + 48000])

    print(f"\n{len(pipe.segments)} speech segment(s) detected:")
    for seg in pipe.segments:
        print(f"  {seg['sample_from'] / 48000:7.2f}s .. {seg['sample_to'] / 48000:7.2f}s")

    # 4. Score against the labels (the reference's extrude/fill-gap math).
    vad = [SpeechSegment(from_sec=s["sample_from"] / 48000,
                         to_sec=s["sample_to"] / 48000, side="vad")
           for s in pipe.segments]
    ref = [SpeechSegment(from_sec=a, to_sec=b, side="ref") for a, b in labels]
    stats = statistics.from_evaluator(
        init_and_run(vad, ref),
        statistics.StatConfig(ignore_shorter_than_sec=0.7, extrude_start=5.0,
                              extrude_end=10.0, fill_gaps=5.0),
    )
    print(f"\nTPR {100 * stats.true_positive_rate:.1f}%  "
          f"PPV {100 * stats.precision:.1f}%  ({len(clips)} clip(s))")
    return 0


if __name__ == "__main__":
    sys.exit(main())
