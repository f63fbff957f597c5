"""Golden end-to-end test: the JAX chunked pipeline must produce
segment-identical VAD output vs the sequential numpy mirror of the Zig
reference semantics (the acceptance criterion SURVEY.md §4 calls for and the
reference itself never automated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.pipeline import denoiser, vad
from formula_vad_tpu.testing.ref_mirror import NSNet2Mirror, PipelineMirror, VADMachineMirror


@pytest.fixture(scope="module")
def params():
    return nsnet2.init_params(jax.random.PRNGKey(7))


def make_speechy_audio(n_chunks: int, seed: int = 0) -> np.ndarray:
    """Synthesize stereo with quiet noise + loud correlated speech-band bursts."""
    rng = np.random.default_rng(seed)
    t_total = n_chunks * 24000
    t = np.arange(t_total) / 48000.0
    base = 0.003 * rng.standard_normal((2, t_total))
    # speech bursts: correlated 700/1300 Hz tones with amplitude envelope
    env = np.zeros(t_total)
    for start_s, dur_s in [(2.0, 1.5), (6.0, 2.5), (11.5, 1.0)]:
        i0, i1 = int(start_s * 48000), int((start_s + dur_s) * 48000)
        if i0 < t_total:
            env[i0 : min(i1, t_total)] = 1.0
    speech = (0.25 * np.sin(2 * np.pi * 700 * t) + 0.15 * np.sin(2 * np.pi * 1300 * t)) * env
    audio = base + np.stack([speech, 0.9 * speech])
    return audio.astype(np.float32)


class TestDenoiserParity:
    def test_chunked_denoiser_matches_mirror(self, params):
        """JAX denoise_chunk vs the sequential per-channel mirror, 3 chunks."""
        rng = np.random.default_rng(1)
        audio = (0.1 * rng.standard_normal((1, 3 * 24000))).astype(np.float32)
        mirror = NSNet2Mirror(params)
        carry = denoiser.init_carry(1)
        for k in range(3):
            chunk = audio[:, k * 24000 : (k + 1) * 24000]
            expected = mirror.denoise(chunk[0])
            carry, got = denoiser.denoise_chunk(params, carry, jnp.asarray(chunk))
            np.testing.assert_allclose(
                np.asarray(got)[0], expected, atol=2e-5,
                err_msg=f"denoised chunk {k} diverged from reference mirror",
            )


class TestFSMParity:
    def test_fsm_matches_mirror_on_synthetic_volumes(self):
        """Drive both FSMs with identical per-window inputs; require identical
        events and segments."""
        from formula_vad_tpu.pipeline import fsm as jfsm

        cfg = VADMachineConfig(
            # shrink the long window so the test exercises ring wraparound
            long_term_speech_avg_sec=3.0,
        )
        sr, fft = 48000, 1024
        shape, fsm_params = jfsm.statics_from_config(cfg, sr, fft)
        mirror = VADMachineMirror(cfg, sr, fft)

        rng = np.random.default_rng(2)
        n = 700
        # volumes: mostly noise floor ~0.005, bursts of 0.3
        vols = 0.004 + 0.002 * rng.random(n)
        ratios = 0.2 + 0.1 * rng.random(n)
        for a, b in [(100, 160), (300, 420), (500, 520), (600, 604)]:
            vols[a:b] = 0.3
            ratios[a:b] = 0.9

        carry = jfsm.init_carry(shape, fsm_params)
        carry, outs = jfsm.scan_windows(
            shape,
            fsm_params,
            carry,
            jnp.asarray(vols, jnp.float32),
            jnp.asarray(ratios, jnp.float32),
            jnp.arange(n, dtype=jnp.int32),
            jnp.ones(n, bool),
        )
        for i in range(n):
            mirror.run(i * fft, np.float32(vols[i]), np.float32(ratios[i]))

        # segments identical
        got_segs = [
            (int(outs.seg_start_win[i]) * fft, int(outs.seg_end_win[i]) * fft)
            for i in np.nonzero(np.asarray(outs.seg_valid))[0]
        ]
        exp_segs = [
            (s["sample_from"], s["sample_to"]) for s in mirror.segments
        ]
        margin = cfg.recording_margin_samples(sr)
        got_with_margin = [(max(0, a - margin), b + margin) for a, b in got_segs]
        assert got_with_margin == exp_segs, (got_with_margin, exp_segs)
        # events identical
        ev_codes = {1: "started", 2: "completed", 3: "aborted"}
        got_events = [
            ev_codes[int(e)]
            for e in np.asarray(outs.event).reshape(-1)
            if int(e) != 0
        ]
        exp_events = [name for name, _ in mirror.events]
        assert got_events == exp_events

        # segment stats match closely (f32 vs f64 rolling averages)
        for i, seg_idx in enumerate(np.nonzero(np.asarray(outs.seg_valid))[0]):
            assert float(outs.seg_ratio[seg_idx]) == pytest.approx(
                mirror.segments[i]["avg_channel_vol_ratio"], abs=1e-5
            )
            assert float(outs.seg_met_sec[seg_idx]) == pytest.approx(
                mirror.segments[i]["vad_met_sec"], abs=1e-4
            )


class TestEndToEndGolden:
    def test_segment_identical_vs_mirror(self, params):
        """Full pipeline (denoise -> fft windows -> FSM) vs the full mirror.

        Uses a shortened long-term window so the noise floor adapts within a
        30 s test signal; default 180 s would simply never trigger adaptation
        in-test (the decision path is identical either way).
        """
        cfg = VADMachineConfig(long_term_speech_avg_sec=10.0)
        audio = make_speechy_audio(n_chunks=30)

        mirror = PipelineMirror(params, cfg)
        expected = mirror.run(audio)

        st = vad.statics_from_config(VADConfig(vad_machine_config=cfg))
        carry, outputs = jax.jit(
            lambda a: vad.process_stream(params, st, a)
        )(jnp.asarray(audio))
        got = vad.segments_from_outputs(st, outputs)

        assert len(got) == len(expected), (got, expected)
        for g, e in zip(got, expected):
            assert g["sample_from"] == e["sample_from"]
            assert g["sample_to"] == e["sample_to"]
            assert g["avg_channel_vol_ratio"] == pytest.approx(
                e["avg_channel_vol_ratio"], abs=1e-4
            )
            assert g["vad_met_sec"] == pytest.approx(e["vad_met_sec"], abs=1e-3)
        # sanity: the synthetic audio actually produced speech segments
        assert len(got) >= 2

    def test_default_config_golden(self, params):
        """Default reference config (180 s long-term window => length 8437,
        short 9, ratio 23) on 60 s of audio: exercises the exact derived
        window sizes and the frozen-update threshold behavior end-to-end."""
        cfg = VADMachineConfig()  # pure defaults
        audio = make_speechy_audio(n_chunks=120, seed=11)

        mirror = PipelineMirror(params, cfg)
        expected = mirror.run(audio)

        st = vad.statics_from_config(VADConfig(vad_machine_config=cfg))
        assert st.fsm_shape.long_window == 8437
        assert st.fsm_shape.short_window == 9
        assert st.fsm_shape.ratio_window == 23
        carry, outputs = jax.jit(lambda a: vad.process_stream(params, st, a))(
            jnp.asarray(audio)
        )
        got = vad.segments_from_outputs(st, outputs)
        assert [(g["sample_from"], g["sample_to"]) for g in got] == [
            (e["sample_from"], e["sample_to"]) for e in expected
        ]
        assert len(got) >= 2  # with the 0.005 initial floor the bursts trigger
