"""Sony Wave64 (.w64) container decode (round 5 container breadth).

The reference decodes W64 via libsndfile's sf_open
(AudioFileStream.zig:22-83); W64 is RIFF's chunk grammar with 16-byte
GUID chunk ids and 64-bit sizes (sizes INCLUDE the 24-byte chunk header;
8-byte alignment) — the container long-tail item from VERDICT r4
missing #4 most likely after G.711.
"""

import struct

import numpy as np
import pytest

from formula_vad_tpu.io_ import AudioBuffer, AudioSource, wav
from formula_vad_tpu.io_.audio import sniff_container


def _w64(path, fmt_body: bytes, payload: bytes, extra_chunk: bytes = b""):
    """Assemble a minimal W64 file (fmt + optional junk + data)."""
    def chunk(guid, body):
        size = 24 + len(body)
        pad = (-size) % 8
        return guid + struct.pack("<Q", size) + body + b"\x00" * pad

    chunks = chunk(wav.W64_FMT, fmt_body)
    if extra_chunk:
        chunks += chunk(b"junk" + wav.W64_RIFF[4:], extra_chunk)
    chunks += chunk(wav.W64_DATA, payload)
    blob = wav.W64_RIFF + struct.pack("<Q", 40 + len(chunks)) + wav.W64_WAVE + chunks
    with open(path, "wb") as f:
        f.write(blob)


def _fmt(tag, n_ch, rate, bits):
    return struct.pack(
        "<HHIIHH", tag, n_ch, rate, rate * n_ch * bits // 8, n_ch * bits // 8, bits
    )


def test_w64_pcm16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pcm = (rng.uniform(-0.9, 0.9, (300, 2)) * 32767).astype("<i2")
    p = tmp_path / "t.w64"
    _w64(str(p), _fmt(1, 2, 48000, 16), pcm.tobytes(), extra_chunk=b"x" * 13)

    assert sniff_container(str(p)) == "wav"
    data, rate = wav.read_wav(str(p))
    assert rate == 48000 and data.shape == (2, 300)
    np.testing.assert_allclose(
        data, pcm.astype(np.float32).T / 32768.0, atol=1e-7
    )


def test_w64_float32_stream_and_seek(tmp_path):
    x = np.linspace(-1, 1, 500, dtype=np.float32)
    p = tmp_path / "f.w64"
    _w64(str(p), _fmt(3, 1, 16000, 32), x.tobytes())

    src = AudioSource.open_stream(str(p))
    assert src.n_frames == 500 and src.sample_rate == 16000
    a = src.read(200)
    src.seek_to_sample(100)
    b = src.read(100)
    np.testing.assert_array_equal(a[0, 100:200], b[0])
    src.close()
    buf = AudioBuffer.load_from_file(str(p))
    np.testing.assert_array_equal(buf.channel_pcm[0], x)


def test_w64_mulaw(tmp_path):
    audioop = pytest.importorskip("audioop")
    pcm = (np.sin(np.linspace(0, 20, 400)) * 20000).astype("<i2")
    enc = audioop.lin2ulaw(pcm.tobytes(), 2)
    p = tmp_path / "m.w64"
    _w64(str(p), _fmt(7, 1, 8000, 8), enc)
    data, rate = wav.read_wav(str(p))
    want = np.frombuffer(audioop.ulaw2lin(enc, 2), "<i2").astype(np.float32) / 32768.0
    np.testing.assert_allclose(data[0], want, atol=1e-7)


def test_w64_malformed(tmp_path):
    p = tmp_path / "bad.w64"
    # Valid riff GUID but wrong wave GUID.
    p.write_bytes(wav.W64_RIFF + struct.pack("<Q", 48) + b"\x00" * 16)
    with pytest.raises(ValueError, match="Wave64"):
        wav.read_wav(str(p))
    # Chunk size below the 24-byte header size.
    blob = (wav.W64_RIFF + struct.pack("<Q", 64) + wav.W64_WAVE
            + wav.W64_FMT + struct.pack("<Q", 10))
    p.write_bytes(blob)
    with pytest.raises(ValueError, match="below header"):
        wav.read_wav(str(p))


def test_w64_guid_constants_match_reference_implementations():
    """The two GUID families are pinned byte-for-byte to the constants in
    libsndfile w64.c / ffmpeg w64.c (ff_w64_guid_riff / ff_w64_guid_wave):
    the file marker is fourcc+{2E91-11CF-A5D6-28DB04C10000} but wave/fmt/
    data use fourcc+{ACF3-11D3-8CD1-00C04F8EDB8A}. An earlier revision
    reused the riff suffix for all four — which decodes nothing written
    by real encoders — so these bytes are pinned independently of the
    writer helper in this file."""
    assert wav.W64_RIFF == bytes(
        [0x72, 0x69, 0x66, 0x66, 0x2E, 0x91, 0xCF, 0x11,
         0xA5, 0xD6, 0x28, 0xDB, 0x04, 0xC1, 0x00, 0x00])
    suffix = bytes([0xF3, 0xAC, 0xD3, 0x11, 0x8C, 0xD1,
                    0x00, 0xC0, 0x4F, 0x8E, 0xDB, 0x8A])
    assert wav.W64_WAVE == b"wave" + suffix
    assert wav.W64_FMT == b"fmt " + suffix
    assert wav.W64_DATA == b"data" + suffix
