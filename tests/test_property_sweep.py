"""Property sweep: random machine configs and audio — the offline
chunk-parallel path must be segment-identical to the streaming scan path
under every config (different ring sizes, thresholds, gaps, durations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.pipeline import offline, vad


@pytest.fixture(scope="module")
def params():
    return nsnet2.init_params(jax.random.PRNGKey(13))


def random_config(rng) -> VADMachineConfig:
    return VADMachineConfig(
        long_term_speech_avg_sec=float(rng.choice([2.0, 5.0, 30.0])),
        initial_long_term_avg=float(rng.choice([0.002, 0.005, 0.02])),
        short_term_speech_avg_sec=float(rng.choice([0.1, 0.2, 0.5])),
        speech_threshold_factor=float(rng.choice([3.0, 10.0, 20.0])),
        channel_vol_ratio_avg_sec=float(rng.choice([0.3, 0.5, 1.0])),
        channel_vol_ratio_threshold=float(rng.choice([0.3, 0.5])),
        min_consecutive_sec_to_open=float(rng.choice([0.1, 0.2, 0.5])),
        max_speech_gap_sec=float(rng.choice([0.5, 1.0, 2.0])),
        min_vad_duration_sec=float(rng.choice([0.3, 0.7, 1.5])),
    )


def random_audio(rng, n_chunks):
    t_total = n_chunks * 24000
    t = np.arange(t_total) / 48000.0
    audio = (0.004 * rng.standard_normal((2, t_total))).astype(np.float32)
    n_bursts = rng.integers(1, 5)
    for _ in range(n_bursts):
        a = rng.uniform(0, n_chunks * 0.5 - 3)
        d = rng.uniform(0.3, 2.5)
        sl = slice(int(a * 48000), int((a + d) * 48000))
        f = rng.uniform(600, 1800)
        amp = rng.uniform(0.1, 0.4)
        burst = (amp * np.sin(2 * np.pi * f * t[sl])).astype(np.float32)
        audio[0, sl] += burst
        audio[1, sl] += rng.uniform(0.7, 1.0) * burst
    return audio


@pytest.mark.parametrize("seed", range(5))
def test_offline_equals_scan_random_config(params, seed):
    rng = np.random.default_rng(100 + seed)
    cfg = random_config(rng)
    st = vad.statics_from_config(VADConfig(vad_machine_config=cfg))
    audio = random_audio(rng, n_chunks=10)

    _, outs = jax.jit(lambda a: vad.process_stream(params, st, a))(jnp.asarray(audio))
    expected = vad.segments_from_outputs(st, outs)

    win_out, valid, _ = jax.jit(
        lambda a: offline.process_stream_offline(params, st, a)
    )(jnp.asarray(audio))
    got = offline.segments_from_offline(st, win_out)
    assert got == expected, (cfg, got, expected)
