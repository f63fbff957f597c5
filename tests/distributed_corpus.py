"""Shared deterministic corpus for the multi-process distributed test —
imported by both the pytest process and the spawned workers so every
participant computes bit-identical inputs."""

import numpy as np

from formula_vad_tpu.config import VADMachineConfig

CHUNK = 24000


def machine_config() -> VADMachineConfig:
    return VADMachineConfig(long_term_speech_avg_sec=10.0)


def make_batch():
    """4 ragged streams (one with no speech, one short) -> padded [4, 2, T]
    float32 + true lengths."""
    rng = np.random.default_rng(424242)
    n_chunks = 12
    t_total = n_chunks * CHUNK
    t = np.arange(t_total) / 48000.0
    streams = []
    lengths = []
    # Segments only close after a 2 s post-burst gap (max_speech_gap), so
    # every burst ends >= 2.5 s before its stream's valid length.
    burst_plans = [
        [(1.0, 2.0)],
        [],
        [(0.5, 1.5), (2.6, 0.9)],
        [(0.8, 1.2)],
    ]
    for i, bursts in enumerate(burst_plans):
        audio = (0.003 * rng.standard_normal((2, t_total))).astype(np.float32)
        env = np.zeros(t_total)
        for a, d in bursts:
            env[int(a * 48000) : int((a + d) * 48000)] = 1.0
        speech = (
            0.25 * np.sin(2 * np.pi * (700 + 50 * i) * t)
            + 0.15 * np.sin(2 * np.pi * 1300 * t)
        ) * env
        audio += np.stack([speech, 0.9 * speech]).astype(np.float32)
        streams.append(audio)
        lengths.append(t_total if i != 3 else 9 * CHUNK + 1234)
    return np.stack(streams), lengths
