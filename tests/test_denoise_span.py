"""denoise_span bounded-horizon exactness + batched simulator clip saving."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.pipeline import offline


@pytest.fixture(scope="module")
def params():
    return nsnet2.init_params(jax.random.PRNGKey(11))


class TestDenoiseSpan:
    def test_exact_after_warmup(self, params):
        """A zero-init run starting 2 chunks early reproduces the full-stream
        denoised output exactly on the target span."""
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal((2, 8 * 24000))).astype(np.float32)
        full = np.asarray(offline.denoise_offline(params, jnp.asarray(audio)))
        for start, end in [(3, 6), (2, 8), (0, 2), (1, 4)]:
            span = np.asarray(
                offline.denoise_span(params, jnp.asarray(audio[:, : end * 24000]), start, end)
            )
            np.testing.assert_allclose(
                span,
                full[:, start * 24000 : end * 24000],
                atol=1e-6,
                err_msg=f"span {start}:{end}",
            )

    def test_batched_simulator_saves_clips(self, tmp_path, capsys):
        from formula_vad_tpu.apps import simulator
        from formula_vad_tpu.io_.wav import read_wav, write_wav

        rng = np.random.default_rng(1)
        t_total = 16 * 24000
        t = np.arange(t_total) / 48000.0
        audio = (0.003 * rng.standard_normal((2, t_total))).astype(np.float32)
        sl = slice(int(2 * 48000), int(4 * 48000))
        burst = (0.3 * np.sin(2 * np.pi * 800 * t[sl])).astype(np.float32)
        audio[0, sl] += burst
        audio[1, sl] += 0.9 * burst

        write_wav(str(tmp_path / "a.wav"), audio, 48000)
        (tmp_path / "r.txt").write_text("2.0\t4.0\tspeech\n")
        plan = {
            "instances": [{"name": "S", "audio_path": "a.wav", "ref_path": "r.txt"}],
            "config": {
                "output_dir": "out",
                "batch_streams": True,
                # WAV here so the exact-content assertions below hold (the
                # default is lossy Ogg Vorbis, covered by tests/test_ogg.py).
                "recording_format": "wav",
                "vad_config": {"vad_machine_config": {"long_term_speech_avg_sec": 10.0}},
            },
        }
        (tmp_path / "plan.json").write_text(json.dumps(plan))
        assert simulator.main(["-i", str(tmp_path / "plan.json")]) == 0
        run_dir = next((tmp_path / "out").iterdir())
        clips = sorted((run_dir / "S").glob("*.wav"))
        kinds = {c.name.split("-")[1] for c in clips}
        assert kinds == {"original.wav", "denoised.wav"}, clips
        # original clip content matches the source audio span (mono, quietest)
        orig = [c for c in clips if "original" in c.name][0]
        start = int(orig.name.split("-")[0])
        data, rate = read_wav(str(orig))
        assert rate == 48000
        assert data.shape[0] == 1
        span = audio[:, start : start + data.shape[1]]
        rms = np.sqrt(np.mean(span**2, axis=1))
        np.testing.assert_array_equal(data[0], span[int(np.argmin(rms))])
