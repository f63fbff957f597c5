"""G.711 µ-law / A-law WAV decode (VERDICT r4 next-#7).

The reference decodes WAVE_FORMAT_MULAW/ALAW via libsndfile's sf_open
(AudioFileStream.zig:22-83) — common in radio/telephony archives, exactly
this framework's target domain. Oracle: the CPython ``audioop`` module's
CCITT G.711 tables (present through 3.12); decode must match bit-exactly
on the 16-bit scale for all 256 byte values.
"""

import struct

import numpy as np
import pytest

audioop = pytest.importorskip("audioop")

from formula_vad_tpu.io_ import AudioBuffer, AudioSource, wav


def _write_g711_wav(path, payload: bytes, tag: int, n_ch: int, rate: int = 8000):
    """Minimal RIFF/WAVE with an 8-bit G.711 data chunk."""
    fmt = struct.pack("<HHIIHH", tag, n_ch, rate, rate * n_ch, n_ch, 8)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)


def test_mulaw_table_matches_audioop_exactly():
    all_bytes = bytes(range(256))
    want = np.frombuffer(audioop.ulaw2lin(all_bytes, 2), "<i2").astype(np.int32)
    got = np.round(wav._MULAW_TABLE * 32768.0).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_alaw_table_matches_audioop_exactly():
    all_bytes = bytes(range(256))
    want = np.frombuffer(audioop.alaw2lin(all_bytes, 2), "<i2").astype(np.int32)
    got = np.round(wav._ALAW_TABLE * 32768.0).astype(np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("law,tag", [("ulaw", 0x0007), ("alaw", 0x0006)])
def test_g711_wav_roundtrip(tmp_path, law, tag):
    """Encode a sine with audioop, decode through the WAV reader, compare
    against audioop's own decode (bit-exact on the 16-bit scale)."""
    t = np.arange(800) / 8000.0
    pcm = (0.5 * np.sin(2 * np.pi * 440.0 * t) * 32767).astype("<i2")
    enc = getattr(audioop, f"lin2{law}")(pcm.tobytes(), 2)
    p = tmp_path / f"tone.{law}.wav"
    _write_g711_wav(str(p), enc, tag, n_ch=1)

    data, rate = wav.read_wav(str(p))
    assert rate == 8000 and data.shape == (1, 800)
    want = np.frombuffer(
        getattr(audioop, f"{law}2lin")(enc, 2), "<i2"
    ).astype(np.float32) / 32768.0
    np.testing.assert_allclose(data[0], want, atol=1e-7)
    # Lossy but close: G.711 is ~13/14-bit companded.
    assert np.max(np.abs(data[0] - pcm.astype(np.float32) / 32768.0)) < 0.02


def test_mulaw_stream_read_and_seek(tmp_path):
    rng = np.random.default_rng(0)
    pcm = (rng.uniform(-0.8, 0.8, 1600) * 32767).astype("<i2")
    enc = audioop.lin2ulaw(pcm.tobytes(), 2)
    p = tmp_path / "s.wav"
    _write_g711_wav(str(p), enc, 0x0007, n_ch=1)

    src = AudioSource.open_stream(str(p))
    assert src.n_frames == 1600 and src.sample_rate == 8000
    first = src.read(600)
    src.seek_to_sample(0)
    again = src.read(600)
    np.testing.assert_array_equal(first, again)
    src.seek_to_sample(1500)
    tail = src.read(600)
    assert tail.shape == (1, 100)
    src.close()


def test_alaw_stereo_preload(tmp_path):
    rng = np.random.default_rng(1)
    pcm = (rng.uniform(-0.5, 0.5, (400, 2)) * 32767).astype("<i2")
    enc = audioop.lin2alaw(pcm.reshape(-1).tobytes(), 2)  # interleaved
    p = tmp_path / "st.wav"
    _write_g711_wav(str(p), enc, 0x0006, n_ch=2)

    buf = AudioBuffer.load_from_file(str(p))
    assert buf.n_channels == 2 and buf.length == 400
    want = np.frombuffer(audioop.alaw2lin(enc, 2), "<i2").astype(
        np.float32
    ).reshape(400, 2).T / 32768.0
    np.testing.assert_allclose(buf.channel_pcm, want, atol=1e-7)


def test_g711_wrong_bit_depth_rejected(tmp_path):
    p = tmp_path / "bad.wav"
    fmt = struct.pack("<HHIIHH", 0x0007, 1, 8000, 16000, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    with open(str(p), "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)
    with pytest.raises(ValueError, match="8 bits"):
        wav.read_wav(str(p))
