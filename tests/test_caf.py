"""CAF (Apple Core Audio Format) decode (round-5 container breadth).

The reference decodes CAF via libsndfile's sf_open
(AudioFileStream.zig:22-83). These tests pin the lpcm decode matrix
(int16/24/32 x BE/LE + float32/64), streaming read + sample-exact seek,
the size==-1 "audio to EOF" data chunk streaming encoders write, and
actionable rejection of compressed encodings.
"""

import struct

import numpy as np
import pytest

from formula_vad_tpu.io_ import caf
from formula_vad_tpu.io_.audio import AudioBuffer, AudioSource, sniff_container


def test_roundtrip_pcm16_both_endians(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.uniform(-0.9, 0.9, (2, 400)).astype(np.float32)
    for little in (False, True):
        p = tmp_path / f"t{int(little)}.caf"
        caf.write_caf(str(p), data, 48000, "pcm16", little=little)
        assert sniff_container(str(p)) == "caf"
        got, rate = caf.read_caf(str(p))
        assert rate == 48000
        np.testing.assert_allclose(got, data, atol=1.0 / 32768)


def test_roundtrip_pcm24_and_float32(tmp_path):
    x = np.linspace(-1, 1, 300, dtype=np.float32)[None]
    for fmt, tol in (("pcm24", 1.0 / (1 << 23)), ("float32", 0)):
        for little in (False, True):
            p = tmp_path / f"{fmt}{int(little)}.caf"
            caf.write_caf(str(p), x, 16000, fmt, little=little)
            got, rate = caf.read_caf(str(p))
            np.testing.assert_allclose(got, x, atol=tol)


def test_float64_decode(tmp_path):
    x = np.linspace(-0.5, 0.5, 100)
    desc = struct.pack(">d4sIIIII", 8000.0, b"lpcm", 1, 8, 1, 1, 64)
    payload = x.astype(">f8").tobytes()
    p = tmp_path / "f64.caf"
    with open(p, "wb") as f:
        f.write(b"caff" + struct.pack(">HH", 1, 0))
        f.write(b"desc" + struct.pack(">q", 32) + desc)
        f.write(b"data" + struct.pack(">q", 4 + len(payload)))
        f.write(struct.pack(">I", 0) + payload)
    got, rate = caf.read_caf(str(p))
    np.testing.assert_allclose(got[0], x.astype(np.float32), atol=1e-7)


def test_stream_read_and_seek(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.uniform(-0.8, 0.8, (1, 600)).astype(np.float32)
    p = tmp_path / "s.caf"
    caf.write_caf(str(p), data, 8000, "float32")
    src = AudioSource.open_stream(str(p))
    assert src.n_frames == 600 and src.sample_rate == 8000
    a = src.read(250)
    src.seek_to_sample(100)
    b = src.read(150)
    np.testing.assert_array_equal(a[0, 100:250], b[0])
    src.close()
    buf = AudioBuffer.load_from_file(str(p))
    np.testing.assert_array_equal(buf.channel_pcm, data)


def test_data_size_minus_one_reads_to_eof(tmp_path):
    """Streaming CAF encoders write data size -1 ('audio to EOF')."""
    x = (np.sin(np.linspace(0, 10, 200)) * 0.5).astype(np.float32)
    p = tmp_path / "eof.caf"
    caf.write_caf(str(p), x[None], 8000, "pcm16")
    blob = bytearray(p.read_bytes())
    at = blob.index(b"data")
    blob[at + 4 : at + 12] = struct.pack(">q", -1)
    p.write_bytes(bytes(blob))
    got, rate = caf.read_caf(str(p))
    assert got.shape == (1, 200)
    np.testing.assert_allclose(got[0], x, atol=1.0 / 32768)


def test_compressed_encoding_rejected(tmp_path):
    desc = struct.pack(">d4sIIIII", 44100.0, b"alac", 0, 0, 4096, 2, 0)
    p = tmp_path / "alac.caf"
    with open(p, "wb") as f:
        f.write(b"caff" + struct.pack(">HH", 1, 0))
        f.write(b"desc" + struct.pack(">q", 32) + desc)
        f.write(b"data" + struct.pack(">q", 8) + struct.pack(">I", 0) + b"xxxx")
    with pytest.raises(ValueError, match="alac"):
        caf.read_caf(str(p))


def test_malformed_rejected(tmp_path):
    p = tmp_path / "bad.caf"
    p.write_bytes(b"caff" + struct.pack(">HH", 2, 0))  # bad version
    with pytest.raises(ValueError, match="version"):
        caf.read_caf(str(p))
    p.write_bytes(b"caff" + struct.pack(">HH", 1, 0))  # no chunks at all
    with pytest.raises(ValueError, match="missing desc"):
        caf.read_caf(str(p))
