"""WAV codec and audio container tests."""

import numpy as np
import pytest

from formula_vad_tpu.io_ import AudioBuffer, AudioSource, wav


@pytest.fixture
def stereo(tmp_path):
    rng = np.random.default_rng(0)
    data = (0.5 * rng.standard_normal((2, 48000))).astype(np.float32).clip(-1, 1)
    path = str(tmp_path / "t.wav")
    wav.write_wav(path, data, 48000)
    return path, data


class TestWav:
    def test_float32_round_trip(self, stereo):
        path, data = stereo
        got, rate = wav.read_wav(path)
        assert rate == 48000
        np.testing.assert_array_equal(got, data)

    def test_pcm16_round_trip(self, tmp_path):
        data = np.linspace(-0.9, 0.9, 1000, dtype=np.float32)[None]
        path = str(tmp_path / "p.wav")
        wav.write_wav(path, data, 16000, fmt="pcm16")
        got, rate = wav.read_wav(path)
        assert rate == 16000
        # encode scales by 32767, decode by 1/32768 -> asymmetry up to ~1 step
        np.testing.assert_allclose(got, data, atol=2.0 / 32768)

    def test_pcm24_decode(self, tmp_path):
        # hand-craft a 24-bit file
        import struct

        vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1], np.int32)
        raw = b"".join(struct.pack("<i", int(v))[:3] for v in vals)
        path = tmp_path / "x.wav"
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48000, 48000 * 3, 3, 24))
            f.write(b"data" + struct.pack("<I", len(raw)) + raw)
        got, _ = wav.read_wav(str(path))
        np.testing.assert_allclose(
            got[0], vals.astype(np.float32) / (1 << 23), atol=1e-7
        )

    def test_streaming_reads_and_seek(self, stereo):
        path, data = stereo
        with wav.WavStream(path) as s:
            assert s.n_frames == 48000
            assert s.duration_seconds() == pytest.approx(1.0)
            a = s.read(10000)
            b = s.read(48000)
            assert a.shape == (2, 10000)
            assert b.shape == (2, 38000)
            np.testing.assert_array_equal(np.concatenate([a, b], axis=1), data)
            assert s.read(100).shape == (2, 0)
            s.seek_to_sample(47990)
            np.testing.assert_array_equal(s.read(100), data[:, 47990:])

    def test_not_a_wav(self, tmp_path):
        p = tmp_path / "bad.wav"
        p.write_bytes(b"this is not audio at all, sorry")
        with pytest.raises(ValueError):
            wav.read_wav(str(p))


class TestAudioContainers:
    def test_audio_buffer(self, stereo):
        path, data = stereo
        buf = AudioBuffer.load_from_file(path)
        assert buf.n_channels == 2
        assert buf.length == 48000
        assert buf.duration_seconds == pytest.approx(1.0)

    def test_audio_source_stream_vs_preload(self, stereo):
        path, data = stereo
        s1 = AudioSource.open_stream(path)
        s2 = AudioSource.preload(path)
        assert s1.is_stream and not s2.is_stream
        np.testing.assert_array_equal(s1.read_all(), s2.read_all())
        s1.close()
