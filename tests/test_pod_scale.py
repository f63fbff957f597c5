"""Pod-scale batch shape: many streams per device over the full mesh
(BASELINE config 5: season corpus sharded data-parallel across a slice)."""

import jax
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.parallel.runner import BatchRunner

CFG = VADMachineConfig(long_term_speech_avg_sec=10.0)


def test_16_streams_on_8_device_mesh():
    """2 streams per virtual device; shard-consistency vs per-stream runs."""
    assert len(jax.devices()) == 8
    params = nsnet2.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, t = 16, 16 * 24000
    tt = np.arange(t) / 48000.0
    batch = (0.003 * rng.standard_normal((b, 2, t))).astype(np.float32)
    # half the streams get a speech burst
    for i in range(0, b, 2):
        sl = slice(int(1.0 * 48000), int(2.5 * 48000))
        burst = (0.3 * np.sin(2 * np.pi * (700 + 10 * i) * tt[sl])).astype(np.float32)
        batch[i, 0, sl] += burst
        batch[i, 1, sl] += 0.9 * burst

    runner = BatchRunner(params, VADConfig(vad_machine_config=CFG))
    results = runner.run(batch)
    assert len(results) == 16

    # independent single-stream reference for two representative streams
    solo = BatchRunner(params, VADConfig(vad_machine_config=CFG), use_mesh=False)
    for i in (0, 1, 6):
        expected = solo.run(batch[i : i + 1])[0].segments
        assert results[i].segments == expected, i
    # most burst streams detect speech (random weights: not all frequencies
    # excite the gain mask equally), quiet streams never do
    n_detected = sum(bool(results[i].segments) for i in range(0, b, 2))
    assert n_detected >= b // 4, n_detected
    assert all(not results[i].segments for i in range(1, b, 2))
