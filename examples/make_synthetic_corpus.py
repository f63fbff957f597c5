"""Generate a synthetic labeled radio corpus and a ready-to-run plan.

The reference's acceptance harness needs labeled audio that its repo does
not distribute (SURVEY.md §4: plan JSON points at local files). This script
makes the full metric loop runnable out of the box: N stereo 48 kHz streams
of engine-like noise with amplitude-modulated speech-band bursts, Audacity
label tracks, and a plan.json wired to the weights-free spectral-gate
denoiser (the NSNet2 blob is an absent LFS object upstream, so the gate is
the model family that works without weights).

    python examples/make_synthetic_corpus.py --out /tmp/corpus
    python -m formula_vad_tpu.apps.simulator -i /tmp/corpus/plan.json

Expected report: TPR/PPV near 100% on every stream.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Generators live in the package (formula_vad_tpu.testing.synth) so the
# denoiser-quality eval and tests can synthesize the same corpus family;
# re-exported here so existing imports of this module keep working.
from formula_vad_tpu.testing.synth import (  # noqa: E402
    HARD_SCRIPTS,
    SR,
    _burst,
    synth_hard_stream,
    synth_stream,
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", required=True, help="Corpus output directory")
    ap.add_argument("--streams", type=int, default=3)
    ap.add_argument("--minutes", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--format", choices=("wav", "pcm16", "ogg", "flac", "aiff"),
                    default="wav",
                    help="Audio container: 'wav' = float32 WAV, 'pcm16' = 16-bit "
                         "WAV (half the disk; enables the raw-int16 H2D fast "
                         "path in slab scoring), 'ogg' requires the system "
                         "Vorbis codec, 'flac' a loadable libFLAC "
                         "(io_/flac.py), 'aiff' big-endian PCM (io_/aiff.py)")
    ap.add_argument("--denoiser", default="spectral_gate",
                    help="Denoiser spec written into the plan (default: the "
                         "weights-free spectral gate)")
    ap.add_argument("--train-pairs", type=int, default=0,
                    help="Also write N mono <name>.noisy.wav/<name>.clean.wav "
                         "pairs for `apps.train --data` (clean = bursts only)")
    ap.add_argument("--hard", action="store_true",
                    help="Adversarial corpus (2 fixed 2-minute streams): "
                         "deliberate FN/FP/aborted-segment/min-duration-edge "
                         "constructs so scores are meaningfully below 100%%")
    args = ap.parse_args(argv)

    from formula_vad_tpu.io_ import aiff, flac, ogg
    from formula_vad_tpu.io_.wav import write_wav

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    instances = []
    n_streams = len(HARD_SCRIPTS) if args.hard else args.streams
    for i in range(n_streams):
        name = f"hard-{i:02d}" if args.hard else f"synthetic-{i:02d}"
        if args.hard:
            audio, labels = synth_hard_stream(rng, HARD_SCRIPTS[i])
        else:
            audio, labels = synth_stream(rng, args.minutes * 60.0)
        ext = args.format if args.format in ("ogg", "flac", "aiff") else "wav"
        audio_file = f"{name}.{ext}"
        path = os.path.join(args.out, audio_file)
        if args.format == "ogg":
            ogg.write_ogg(path, audio, SR, quality=0.8)
        elif args.format == "flac":
            flac.write_flac(path, audio, SR, bits=16)
        elif args.format == "aiff":
            aiff.write_aiff(path, audio, SR, bits=16)
        else:
            write_wav(path, audio, SR,
                      fmt="pcm16" if args.format == "pcm16" else "float32")
        ref_file = f"{name}.txt"
        with open(os.path.join(args.out, ref_file), "w") as f:
            f.writelines(f"{a}\t{b}\tspeech\n" for a, b in labels)
        instances.append(
            {"name": name, "audio_path": audio_file, "ref_path": ref_file}
        )
        print(f"{name}: {args.minutes:.1f} min, {len(labels)} speech segments")

    for i in range(args.train_pairs):
        name = f"train-{i:03d}"
        noisy, _, clean = synth_stream(rng, args.minutes * 60.0, components=True)
        # Mono pairs (apps.train reads channel 0); keep the stereo mixdown out
        # so pair files stay half the size of corpus streams.
        write_wav(os.path.join(args.out, f"{name}.noisy.wav"), noisy[:1], SR)
        write_wav(os.path.join(args.out, f"{name}.clean.wav"), clean[:1], SR)
        print(f"{name}: {args.minutes:.1f} min training pair")

    plan = {
        "instances": instances,
        "config": {
            "output_dir": "out",
            "vad_config": {"denoiser_model_path": args.denoiser},
        },
    }
    plan_path = os.path.join(args.out, "plan.json")
    with open(plan_path, "w") as f:
        json.dump(plan, f, indent=2)
    print(f"\nplan written: {plan_path}")
    print(f"run:  python -m formula_vad_tpu.apps.simulator -i {plan_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
