"""Native C++ I/O runtime: build, parity with the numpy reference path."""

import numpy as np
import pytest

from formula_vad_tpu.io_ import native, wav


@pytest.fixture(scope="module")
def lib_ok():
    ok = native.available()
    if not ok:
        pytest.skip("native toolchain unavailable")
    return ok


class TestNativeDecode:
    def _raw_and_info(self, tmp_path, fmt, data):
        path = str(tmp_path / "x.wav")
        wav.write_wav(path, data, 48000, fmt=fmt)
        with open(path, "rb") as f:
            info = wav._parse_header(f)
            f.seek(info.data_offset)
            raw = f.read(info.data_size)
        return raw, info

    def test_pcm16_parity(self, lib_ok, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.uniform(-1, 1, (2, 5000)).astype(np.float32)
        raw, info = self._raw_and_info(tmp_path, "pcm16", data)
        got = native.decode_to_planar(raw, 16, 1, 2)
        expected = np.ascontiguousarray(wav._decode_frames(raw, info).T)
        np.testing.assert_array_equal(got, expected)

    def test_float32_parity(self, lib_ok, tmp_path):
        rng = np.random.default_rng(1)
        data = rng.uniform(-1, 1, (3, 4000)).astype(np.float32)
        raw, info = self._raw_and_info(tmp_path, "float32", data)
        got = native.decode_to_planar(raw, 32, 3, 3)
        np.testing.assert_array_equal(got, data)

    def test_pcm24_parity(self, lib_ok):
        import struct

        vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)], np.int32)
        raw = b"".join(struct.pack("<i", int(v))[:3] for v in vals)
        got = native.decode_to_planar(raw, 24, 1, 1)
        np.testing.assert_allclose(got[0], vals.astype(np.float32) / (1 << 23))

    def test_pcm32_parity(self, lib_ok):
        vals = np.array([0, 1 << 30, -(1 << 30)], np.int32)
        got = native.decode_to_planar(vals.tobytes(), 32, 1, 1)
        np.testing.assert_allclose(got[0], vals.astype(np.float32) / (1 << 31))

    def test_wav_stream_uses_native(self, lib_ok, tmp_path):
        """End-to-end: WavStream round trip is unchanged with native decode."""
        rng = np.random.default_rng(2)
        data = rng.uniform(-1, 1, (2, 48000)).astype(np.float32)
        path = str(tmp_path / "t.wav")
        wav.write_wav(path, data, 48000)
        got, rate = wav.read_wav(path)
        np.testing.assert_array_equal(got, data)


class TestNativeEncode:
    def test_encode_f32(self, lib_ok):
        rng = np.random.default_rng(3)
        planar = rng.standard_normal((2, 100)).astype(np.float32)
        inter = native.encode_f32_interleaved(planar)
        np.testing.assert_array_equal(inter.reshape(100, 2).T, planar)

    def test_encode_pcm16_rounds(self, lib_ok):
        planar = np.array([[0.5, -0.5, 2.0, -2.0]], np.float32)
        out = native.encode_pcm16_interleaved(planar)
        np.testing.assert_array_equal(out, [16384, -16384, 32767, -32767])

    def test_rms(self, lib_ok):
        planar = np.array([[0.5] * 100, [0.25] * 100], np.float32)
        rms = native.rms_per_channel(planar)
        np.testing.assert_allclose(rms, [0.5, 0.25], atol=1e-6)
