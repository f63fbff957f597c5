"""SlabRunner: constant-memory long-stream processing must be segment-
identical to the one-shot offline path and to the streaming scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.parallel.runner import BatchRunner
from formula_vad_tpu.parallel.slab_runner import SlabRunner
from formula_vad_tpu.pipeline import offline

CFG = VADMachineConfig(long_term_speech_avg_sec=10.0)


@pytest.fixture(scope="module")
def params():
    return nsnet2.init_params(jax.random.PRNGKey(9))


def speechy(n_chunks, bursts, seed):
    rng = np.random.default_rng(seed)
    t_total = n_chunks * 24000
    t = np.arange(t_total) / 48000.0
    base = 0.003 * rng.standard_normal((2, t_total))
    env = np.zeros(t_total)
    for a, d in bursts:
        env[int(a * 48000) : int((a + d) * 48000)] = 1.0
    s = (0.25 * np.sin(2 * np.pi * 700 * t) + 0.15 * np.sin(2 * np.pi * 1300 * t)) * env
    return (base + np.stack([s, 0.9 * s])).astype(np.float32)


class TestDenoiseCarryChain:
    def test_slab_chain_equals_oneshot(self, params):
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal((2, 6 * 24000))).astype(np.float32)
        full = np.asarray(offline.denoise_offline(params, jnp.asarray(audio)))
        carry = offline.init_slab_carry(2)
        parts = []
        for s in range(3):
            part, carry = offline.denoise_offline_carry(
                params, jnp.asarray(audio[:, s * 2 * 24000 : (s + 1) * 2 * 24000]), carry
            )
            parts.append(np.asarray(part))
        np.testing.assert_allclose(np.concatenate(parts, axis=-1), full, atol=1e-6)


class TestSlabRunner:
    def test_matches_batch_runner(self, params):
        """2 ragged streams, 40/55 chunks, 32-chunk slabs == one-shot."""
        streams = [
            speechy(55, [(3.0, 2.0), (14.0, 1.5)], seed=1),
            speechy(40, [(1.0, 1.2), (10.0, 2.0)], seed=2),
        ]
        lengths = [s.shape[1] for s in streams]
        max_t = max(lengths)
        batch = np.zeros((2, 2, max_t), np.float32)
        for i, s in enumerate(streams):
            batch[i, :, : s.shape[1]] = s

        one_shot = BatchRunner(params, VADConfig(vad_machine_config=CFG))
        expected = one_shot.run(batch, lengths)

        slab = SlabRunner(params, VADConfig(vad_machine_config=CFG), slab_chunks=32)
        got = slab.run(batch, lengths)

        any_segments = False
        for i in range(2):
            assert got[i].segments == expected[i].segments, i
            any_segments |= bool(expected[i].segments)
        assert any_segments, "test audio must produce segments"

    def test_reader_interface(self, params):
        """run_readers (streaming from a callable) == run (arrays)."""
        audio = speechy(40, [(2.0, 2.0)], seed=3)
        slab = SlabRunner(params, VADConfig(vad_machine_config=CFG), slab_chunks=32)
        a = slab.run(audio[None], [audio.shape[1]])
        slab2 = SlabRunner(params, VADConfig(vad_machine_config=CFG), slab_chunks=32)
        b = slab2.run_readers(
            [lambda s, n: audio[:, s : s + n]], [audio.shape[1]]
        )
        assert a[0].segments == b[0].segments
        assert a[0].segments, "test audio must produce segments"

    def test_raw16_matches_f32(self, params):
        """Raw-int16 slabs with on-device dequant must be bit-identical to
        host-side PCM16 decode: same segments, boundary for boundary."""
        audio = speechy(40, [(2.0, 2.0)], seed=3)
        q = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)
        dec = q.astype(np.float32) / 32768.0  # what the host decoder yields

        slab = SlabRunner(params, VADConfig(vad_machine_config=CFG), slab_chunks=32)
        a = slab.run_readers(
            [lambda s, n: dec[:, s : s + n]], [audio.shape[1]]
        )
        slab2 = SlabRunner(params, VADConfig(vad_machine_config=CFG), slab_chunks=32)
        b = slab2.run_readers(
            [lambda s, n: q[:, s : s + n]], [audio.shape[1]], raw16=True
        )
        assert a[0].segments == b[0].segments
        assert a[0].segments, "test audio must produce segments"


class TestSlabAltConfigs:
    def test_alt_configs_in_slab_mode(self, params):
        """Alt machines run as flattened (stream x config) rows across slabs."""
        alt_same = CFG
        alt_never = VADMachineConfig(
            long_term_speech_avg_sec=10.0, speech_threshold_factor=1000.0
        )
        cfg = VADConfig(
            vad_machine_config=CFG, alt_vad_machine_configs=(alt_same, alt_never)
        )
        streams = [
            speechy(40, [(2.0, 2.0)], seed=4),
            speechy(36, [(1.0, 1.5)], seed=5),
        ]
        lengths = [s.shape[1] for s in streams]
        max_t = max(lengths)
        batch = np.zeros((2, 2, max_t), np.float32)
        for i, s in enumerate(streams):
            batch[i, :, : s.shape[1]] = s

        runner = SlabRunner(params, cfg, slab_chunks=32)
        results = runner.run(batch, lengths)
        fired = False
        for r in results:
            assert r.alt_segments[0] == r.segments
            assert r.alt_segments[1] == []
            fired |= bool(r.segments)
        assert fired
