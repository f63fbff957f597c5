"""Sun/NeXT AU (.au/.snd) decode (round-5 container breadth).

The reference decodes AU via libsndfile's sf_open
(AudioFileStream.zig:22-83); AU is the classic G.711 telephony container.
Oracle for the companded encodings: CPython audioop's CCITT tables.
"""

import struct

import numpy as np
import pytest

from formula_vad_tpu.io_ import au
from formula_vad_tpu.io_.audio import AudioBuffer, AudioSource, sniff_container


def _au(path, payload: bytes, enc: int, rate: int, n_ch: int,
        offset: int = 24, size: int = None, annotation: bytes = b""):
    with open(path, "wb") as f:
        f.write(b".snd" + struct.pack(
            ">IIIII", offset, len(payload) if size is None else size,
            enc, rate, n_ch))
        f.write(annotation + payload)


def test_pcm16_roundtrip_and_sniff(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.uniform(-0.9, 0.9, (2, 300)).astype(np.float32)
    p = tmp_path / "t.au"
    au.write_au(str(p), data, 8000, "pcm16")
    assert sniff_container(str(p)) == "au"
    got, rate = au.read_au(str(p))
    assert rate == 8000
    np.testing.assert_allclose(got, data, atol=1.0 / 32768)


def test_mulaw_matches_audioop(tmp_path):
    audioop = pytest.importorskip("audioop")
    pcm = (np.sin(np.linspace(0, 30, 500)) * 24000).astype("<i2")
    enc = audioop.lin2ulaw(pcm.tobytes(), 2)
    p = tmp_path / "m.au"
    _au(str(p), enc, 1, 8000, 1)
    got, rate = au.read_au(str(p))
    want = np.frombuffer(audioop.ulaw2lin(enc, 2), "<i2").astype(np.float32) / 32768.0
    np.testing.assert_allclose(got[0], want, atol=1e-7)


def test_alaw_and_annotation_offset(tmp_path):
    audioop = pytest.importorskip("audioop")
    pcm = (np.linspace(-0.7, 0.7, 256) * 32767).astype("<i2")
    enc = audioop.lin2alaw(pcm.tobytes(), 2)
    p = tmp_path / "a.au"
    # 16-byte annotation between header and data (offset 40).
    _au(str(p), enc, 27, 8000, 1, offset=40, annotation=b"annotation-text\x00")
    got, rate = au.read_au(str(p))
    want = np.frombuffer(audioop.alaw2lin(enc, 2), "<i2").astype(np.float32) / 32768.0
    np.testing.assert_allclose(got[0], want, atol=1e-7)


def test_unknown_size_reads_to_eof_and_stream_seek(tmp_path):
    x = np.linspace(-1, 1, 400, dtype=np.float32)
    payload = x.astype(">f4").tobytes()
    p = tmp_path / "e.au"
    _au(str(p), payload, 6, 16000, 1, size=0xFFFFFFFF)
    src = AudioSource.open_stream(str(p))
    assert src.n_frames == 400 and src.sample_rate == 16000
    a = src.read(150)
    src.seek_to_sample(50)
    b = src.read(100)
    np.testing.assert_array_equal(a[0, 50:150], b[0])
    src.close()
    buf = AudioBuffer.load_from_file(str(p))
    np.testing.assert_array_equal(buf.channel_pcm[0], x)


def test_pcm24_and_signed_pcm8(tmp_path):
    # 24-bit BE triples for [-0.5, 0.25]
    vals = np.array([-0.5, 0.25], np.float32)
    ints = np.round(vals * (1 << 23)).astype("<i4")
    trip = ints.view(np.uint8).reshape(-1, 4)[:, 2::-1]  # BE 3-byte
    p = tmp_path / "p24.au"
    _au(str(p), np.ascontiguousarray(trip).tobytes(), 4, 8000, 1)
    got, _ = au.read_au(str(p))
    np.testing.assert_allclose(got[0], vals, atol=1.0 / (1 << 23))
    # AU 8-bit is SIGNED linear (unlike WAV u8).
    p8 = tmp_path / "p8.au"
    _au(str(p8), np.array([-128, 0, 127], np.int8).tobytes(), 2, 8000, 1)
    got8, _ = au.read_au(str(p8))
    np.testing.assert_allclose(got8[0], [-1.0, 0.0, 127 / 128.0], atol=1e-7)


def test_malformed_rejected(tmp_path):
    p = tmp_path / "bad.au"
    _au(str(p), b"\x00" * 8, 23, 8000, 1)  # ADPCM variant: unsupported
    with pytest.raises(ValueError, match="encoding 23"):
        au.read_au(str(p))
    _au(str(p), b"\x00" * 8, 3, 8000, 1, offset=4096)  # offset beyond file
    with pytest.raises(ValueError, match="exceeds file"):
        au.read_au(str(p))
    p.write_bytes(b".snd\x00\x00")  # truncated header
    with pytest.raises(ValueError, match="not an AU"):
        au.read_au(str(p))


def test_fuzzed_headers_raise_cleanly(tmp_path):
    rng = np.random.default_rng(13)
    base_arr = np.zeros((1, 64), np.float32)
    p = tmp_path / "f.au"
    au.write_au(str(p), base_arr, 8000, "pcm16")
    base = p.read_bytes()
    for _ in range(200):
        raw = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            raw[int(rng.integers(0, 24))] = int(rng.integers(0, 256))
        p.write_bytes(bytes(raw))
        try:
            data, _rate = au.read_au(str(p))
            assert data.ndim == 2
        except ValueError:
            pass
