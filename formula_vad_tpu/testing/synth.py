"""Synthetic radio-corpus signal generators (package-importable).

The generator family behind ``examples/make_synthetic_corpus.py`` — engine-
like background noise (white noise + drifting low-frequency harmonics) with
amplitude-modulated speech-band bursts correlated across channels, matching
the acoustic regime the reference's pipeline targets (SURVEY.md §4; the
reference's own labeled corpus is not distributed with its repo). Lives in
the package so the denoiser-quality eval (``eval/denoise_quality.py``),
``apps.train --eval`` and the test suite can all synthesize held-out
(noisy, clean) pairs without importing from ``examples/``.

``synth_stream(components=True)`` returns the bursts-only "clean speech"
component alongside the noisy mix — the (noisy, clean) pair convention used
for training and for denoising-quality scoring.
"""

from __future__ import annotations

import numpy as np

SR = 48000


def synth_stream(rng: np.random.Generator, seconds: float, components: bool = False):
    """One stereo stream + its (from_sec, to_sec) speech labels.

    With components=True also returns the bursts-only ("clean speech")
    signal — the training target for (noisy, clean) denoiser pairs."""
    n = int(seconds * SR)
    t = np.arange(n) / SR
    # Engine-ish background: white noise + strong low-frequency harmonics
    # with slow RPM drift (energy mostly below the 500-2000 Hz speech band).
    rpm = 90.0 + 40.0 * np.sin(2 * np.pi * 0.05 * t + rng.uniform(0, 6.28))
    phase = 2 * np.pi * np.cumsum(rpm) / SR
    audio = rng.standard_normal((2, n)).astype(np.float32) * 0.015
    for harmonic, amp in ((1, 0.10), (2, 0.06), (3, 0.03)):
        audio += (amp * np.sin(harmonic * phase)).astype(np.float32)
    clean = np.zeros((2, n), np.float32) if components else None

    # Speech bursts: AM-modulated multi-tone in the 500-2000 Hz band,
    # correlated across channels (driver audio appears in both channels;
    # VADMachine's stereo ratio cue, VADMachine.zig:166-171).
    labels = []
    pos = rng.uniform(3.0, 8.0)
    while pos + 1.0 < seconds - 2.0:
        dur = float(rng.uniform(1.2, 5.0))
        if pos + dur > seconds - 2.0:
            break
        sl = slice(int(pos * SR), int((pos + dur) * SR))
        tt = t[sl]
        burst = np.zeros(sl.stop - sl.start, np.float32)
        for _ in range(4):
            f = rng.uniform(500.0, 2000.0)
            burst += np.sin(2 * np.pi * f * tt + rng.uniform(0, 6.28)).astype(np.float32)
        syllable = 0.55 + 0.45 * np.sign(np.sin(2 * np.pi * rng.uniform(3.0, 5.0) * tt))
        burst *= 0.12 * syllable.astype(np.float32)
        audio[0, sl] += burst
        audio[1, sl] += 0.85 * burst
        if components:
            clean[0, sl] += burst
            clean[1, sl] += 0.85 * burst
        labels.append((round(pos, 3), round(pos + dur, 3)))
        pos += dur + float(rng.uniform(6.0, 15.0))
    if components:
        return audio.astype(np.float32), labels, clean
    return audio.astype(np.float32), labels


def _burst(rng: np.random.Generator, t: np.ndarray, amp: float) -> np.ndarray:
    """AM-modulated multi-tone speech-band burst (same family as
    synth_stream's bursts)."""
    out = np.zeros(t.shape[0], np.float32)
    for _ in range(4):
        f = rng.uniform(500.0, 2000.0)
        out += np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28)).astype(np.float32)
    syllable = 0.55 + 0.45 * np.sign(np.sin(2 * np.pi * rng.uniform(3.0, 5.0) * t))
    return amp * out * syllable.astype(np.float32)


# Adversarial event scripts: (kind, start_sec, *kind_args). Events are
# spaced >= 15 s so an unlabeled burst's detection (+-2 s margins) clears
# the scoring extrusion (extrude_start=5/extrude_end=10, simulator.zig:
# 127-133) of every labeled neighbour and scores as genuine FP seconds.
HARD_SCRIPTS = [
    [
        ("normal", 5.0, 2.0),          # clean TP
        ("quiet", 22.0, 2.0),          # labeled but below threshold -> FN
        ("fp", 40.0, 2.0),             # loud but UNLABELED -> FP
        ("short", 58.0, 0.4),          # < 0.7 s: FSM aborts; ref ignored
        ("edge", 75.0, 0.85),          # just over the 0.7 s minimum -> TP
        ("gappy", 92.0, 1.2, 1.6, 1.2),  # in-speech gap < max_gap: one seg
    ],
    [
        ("mono", 6.0, 2.5),            # one-channel only: ratio cue -> FN
        ("normal", 24.0, 3.0),         # TP
        ("fp", 42.0, 1.5),             # FP
        ("normal", 60.0, 1.8),         # TP
        ("quiet", 78.0, 2.2),          # FN
        ("pair", 96.0, 1.0, 2.5, 1.0),  # gap > max_gap: two segments/refs
    ],
]


def synth_hard_stream(rng: np.random.Generator, script) -> tuple[np.ndarray, list]:
    """Adversarial stream from an event script: produces FN (quiet or
    single-channel labeled speech), FP (unlabeled loud bursts), aborted
    FSM segments (sub-0.7 s bursts), min-duration-edge segments, in-speech
    gaps near ``max_gap``, and refs under the 0.7 s scoring floor — so the
    full pipeline -> evaluator -> report chain is exercised with
    TPR/PPV < 100% (statistics.zig:191-256 FP math included)."""
    seconds = 120.0
    n = int(seconds * SR)
    t = np.arange(n) / SR
    rpm = 90.0 + 40.0 * np.sin(2 * np.pi * 0.05 * t + rng.uniform(0, 6.28))
    phase = 2 * np.pi * np.cumsum(rpm) / SR
    audio = rng.standard_normal((2, n)).astype(np.float32) * 0.015
    for harmonic, amp in ((1, 0.10), (2, 0.06), (3, 0.03)):
        audio += (amp * np.sin(harmonic * phase)).astype(np.float32)

    labels = []

    def add(pos, dur, amp, ch1_scale=0.85, labeled=True):
        sl = slice(int(pos * SR), int((pos + dur) * SR))
        b = _burst(rng, t[sl], amp)
        audio[0, sl] += b
        audio[1, sl] += ch1_scale * b
        if labeled:
            labels.append((round(pos, 3), round(pos + dur, 3)))

    for ev in script:
        kind, pos = ev[0], ev[1]
        if kind == "normal" or kind == "edge":
            add(pos, ev[2], 0.12)
        elif kind == "quiet":
            add(pos, ev[2], 0.018)
        elif kind == "mono":
            add(pos, ev[2], 0.14, ch1_scale=0.0)
        elif kind == "fp":
            add(pos, ev[2], 0.14, labeled=False)
        elif kind == "short":
            add(pos, ev[2], 0.14)
        elif kind == "gappy":
            d1, gap, d2 = ev[2], ev[3], ev[4]
            add(pos, d1, 0.12, labeled=False)
            add(pos + d1 + gap, d2, 0.12, labeled=False)
            labels.append((round(pos, 3), round(pos + d1 + gap + d2, 3)))
        elif kind == "pair":
            d1, gap, d2 = ev[2], ev[3], ev[4]
            add(pos, d1, 0.12)
            add(pos + d1 + gap, d2, 0.12)
        else:
            raise ValueError(kind)
    return audio.astype(np.float32), labels
