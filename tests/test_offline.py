"""Offline (chunk-parallel) path must match the streaming scan path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.pipeline import denoiser, offline, vad

CFG = VADMachineConfig(long_term_speech_avg_sec=10.0)


@pytest.fixture(scope="module")
def params():
    return nsnet2.init_params(jax.random.PRNGKey(7))


def speechy_audio(n_chunks, bursts, seed=0):
    rng = np.random.default_rng(seed)
    t_total = n_chunks * 24000
    t = np.arange(t_total) / 48000.0
    base = 0.003 * rng.standard_normal((2, t_total))
    env = np.zeros(t_total)
    for start_s, dur_s in bursts:
        i0, i1 = int(start_s * 48000), int((start_s + dur_s) * 48000)
        env[i0 : min(i1, t_total)] = 1.0
    speech = (0.25 * np.sin(2 * np.pi * 700 * t) + 0.15 * np.sin(2 * np.pi * 1300 * t)) * env
    return (base + np.stack([speech, 0.9 * speech])).astype(np.float32)


class TestOfflineDenoiser:
    def test_matches_chunked_scan(self, params):
        """Global-OLA denoiser == chaining denoise_chunk across 4 chunks."""
        rng = np.random.default_rng(1)
        audio = (0.1 * rng.standard_normal((2, 4 * 24000))).astype(np.float32)

        carry = denoiser.init_carry(2)
        outs = []
        for k in range(4):
            carry, den = denoiser.denoise_chunk(
                params, carry, jnp.asarray(audio[:, k * 24000 : (k + 1) * 24000])
            )
            outs.append(np.asarray(den))
        expected = np.concatenate(outs, axis=-1)

        got = np.asarray(offline.denoise_offline(params, jnp.asarray(audio)))
        np.testing.assert_allclose(got, expected, atol=3e-5)


class TestOfflineVAD:
    def test_segments_identical_to_scan(self, params):
        audio = speechy_audio(16, [(2.0, 2.0)], seed=8)
        st = vad.statics_from_config(VADConfig(vad_machine_config=CFG))

        _, outs = jax.jit(lambda a: vad.process_stream(params, st, a))(jnp.asarray(audio))
        expected = vad.segments_from_outputs(st, outs)
        assert expected, "test audio must produce segments"

        win_out, valid, _ = jax.jit(
            lambda a: offline.process_stream_offline(params, st, a)
        )(jnp.asarray(audio))
        got = offline.segments_from_offline(st, win_out)
        assert got == expected

    def test_window_inputs_identical(self, params):
        """The FSM inputs (min_vol, ratios) must match window-for-window."""
        audio = speechy_audio(5, [(1.0, 1.0)], seed=3)
        st = vad.statics_from_config(VADConfig(vad_machine_config=CFG))

        # scan path: capture fsm inputs via the events of a probe config that
        # never fires, then compare rolling state — simpler: compare segments
        # on several random audios incl. boundary-straddling windows.
        for seed in (4, 5):
            a = speechy_audio(7, [(0.7, 0.9), (3.1, 1.3)], seed=seed)
            _, outs = jax.jit(lambda x: vad.process_stream(params, st, x))(jnp.asarray(a))
            exp = vad.segments_from_outputs(st, outs)
            win_out, _, _ = jax.jit(
                lambda x: offline.process_stream_offline(params, st, x)
            )(jnp.asarray(a))
            got = offline.segments_from_offline(st, win_out)
            assert got == exp, f"seed {seed}"

    def test_padding_chunks_masked(self, params):
        """Offline with n_valid_chunks == scan with chunk_valids."""
        audio = speechy_audio(10, [(2.0, 2.0)], seed=6)
        st = vad.statics_from_config(VADConfig(vad_machine_config=CFG))
        n_valid = 7

        cv = jnp.arange(10) < n_valid
        _, outs = jax.jit(
            lambda a, v: vad.process_stream(params, st, a, chunk_valids=v)
        )(jnp.asarray(audio), cv)
        expected = vad.segments_from_outputs(st, outs)

        win_out, valid, _ = jax.jit(
            lambda a, n: offline.process_stream_offline(params, st, a, n_valid_chunks=n)
        )(jnp.asarray(audio), jnp.int32(n_valid))
        got = offline.segments_from_offline(st, win_out)
        assert got == expected
        assert int(np.sum(np.asarray(valid))) == (n_valid * 24000) // 1024


class TestMonoStreams:
    def test_mono_pipeline(self, params):
        """n_channels=1: ratio = min/max = 1.0, so only the volume threshold
        gates (the reference supports arbitrary channel counts)."""
        rng = np.random.default_rng(10)
        t = np.arange(16 * 24000) / 48000.0
        audio = (0.003 * rng.standard_normal((1, 16 * 24000))).astype(np.float32)
        sl = slice(int(2 * 48000), int(4 * 48000))
        audio[0, sl] += (0.3 * np.sin(2 * np.pi * 800 * t[sl])).astype(np.float32)

        st = vad.statics_from_config(
            VADConfig(vad_machine_config=CFG), n_channels=1
        )
        _, outs = jax.jit(lambda a: vad.process_stream(params, st, a))(jnp.asarray(audio))
        expected = vad.segments_from_outputs(st, outs)
        win_out, _, _ = jax.jit(
            lambda a: offline.process_stream_offline(params, st, a)
        )(jnp.asarray(audio))
        got = offline.segments_from_offline(st, win_out)
        assert got == expected
        assert got, "mono burst must produce a segment"
        assert got[0]["avg_channel_vol_ratio"] == pytest.approx(1.0)


class TestSpectralGateModel:
    def test_gate_denoiser_family(self):
        """The weights-free spectral-gate model plugs into both paths and
        the cross-path identity holds."""
        from formula_vad_tpu.models.registry import apply_model, load_denoiser

        gate = load_denoiser("spectral_gate")
        feats = jnp.asarray(
            np.random.default_rng(0).standard_normal((3, 54, 161)) - 6.0, jnp.float32
        )
        g = np.asarray(apply_model(gate, feats))
        assert g.shape == (3, 54, 161)
        assert (g >= 0.1 - 1e-6).all() and (g <= 1.0).all()

        # Amplitude-modulate the burst (speech-like 4 Hz syllable rate): a
        # steady tone is stationary within a chunk and the gate would —
        # correctly — suppress it as noise.
        audio = speechy_audio(16, [(2.0, 2.0)], seed=12)
        t = np.arange(audio.shape[1]) / 48000.0
        audio = (audio * (0.55 + 0.45 * np.sign(np.sin(2 * np.pi * 4 * t)))).astype(
            np.float32
        )
        st = vad.statics_from_config(VADConfig(vad_machine_config=CFG))
        _, outs = jax.jit(lambda a: vad.process_stream(gate, st, a))(jnp.asarray(audio))
        expected = vad.segments_from_outputs(st, outs)
        win_out, _, _ = jax.jit(
            lambda a: offline.process_stream_offline(gate, st, a)
        )(jnp.asarray(audio))
        got = offline.segments_from_offline(st, win_out)
        assert got == expected
        assert got, "gate model must detect the modulated burst"

    def test_registry_specs(self):
        from formula_vad_tpu.models.registry import load_denoiser
        from formula_vad_tpu.models.spectral_gate import SpectralGateParams

        g = load_denoiser("spectral_gate:0.2,2.0,0.05")
        assert g == SpectralGateParams(quantile=0.2, alpha=2.0, floor=0.05)
        assert load_denoiser(None).fc_in_w.shape == (161, 400)
