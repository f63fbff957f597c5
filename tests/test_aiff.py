"""AIFF / AIFF-C container support (io_/aiff.py — extending the round-4
container-breadth work past FLAC; the reference accepts AIFF via
libsndfile, AudioFileStream.zig:22-83)."""

import struct

import numpy as np
import pytest

from formula_vad_tpu.io_ import aiff
from formula_vad_tpu.io_.audio import AudioBuffer, AudioSource, sniff_container


def _sig(seconds=1.0, rate=48000):
    t = np.arange(int(seconds * rate)) / rate
    return np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.25 * np.sin(2 * np.pi * 880 * t)]
    ).astype(np.float32)


def _quant(x, bits):
    s = float(1 << (bits - 1))
    return (np.round(np.clip(x, -1, 1) * s).clip(-s, s - 1) / np.float32(s)).astype(
        np.float32
    )


def test_extended80_parse():
    # canonical constant: 48000 Hz = 0x400E BB80000000000000
    assert aiff._read_extended80(bytes.fromhex("400ebb800000000000000000")[:10]) == 48000.0
    assert aiff._read_extended80(bytes(10)) == 0.0
    with pytest.raises(ValueError):
        aiff._read_extended80(bytes.fromhex("7fff" + "00" * 16)[:10])


@pytest.mark.parametrize("bits", [16, 24])
def test_roundtrip_bitexact(tmp_path, bits):
    sig = _sig()
    p = str(tmp_path / f"a{bits}.aiff")
    aiff.write_aiff(p, sig, 48000, bits=bits)
    data, rate = aiff.read_aiff(p)
    assert rate == 48000
    np.testing.assert_array_equal(data, _quant(sig, bits))


def test_streaming_read_and_seek(tmp_path):
    sig = _sig(2.0)
    p = str(tmp_path / "s.aiff")
    aiff.write_aiff(p, sig, 48000, bits=16)
    whole, _ = aiff.read_aiff(p)
    with aiff.AiffStream(p) as s:
        assert s.sample_rate == 48000 and s.n_channels == 2
        assert s.n_frames == sig.shape[1]
        np.testing.assert_array_equal(s.read(1000), whole[:, :1000])
        s.seek_to_sample(12345)
        np.testing.assert_array_equal(s.read(500), whole[:, 12345:12845])
        s.seek_to_sample(100)
        np.testing.assert_array_equal(s.read(50), whole[:, 100:150])
        s.seek_to_sample(sig.shape[1] - 70)
        assert s.read(1000).shape == (2, 70)
        assert s.read(1000).shape == (2, 0)


def test_mono_8bit_and_32bit(tmp_path):
    """Read-side support for the other PCM widths via a hand-built file."""
    rng = np.random.default_rng(0)
    for bits, dt in ((8, ">i1"), (32, ">i4")):
        n = 1000
        ints = rng.integers(-(1 << (bits - 1)), 1 << (bits - 1), size=n)
        payload = ints.astype(dt).tobytes()
        comm = struct.pack(">HIH", 1, n, bits) + bytes.fromhex(
            "400ebb800000000000000000"
        )[:10]
        ssnd = struct.pack(">II", 0, 0) + payload
        chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
        chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        if len(ssnd) & 1:
            chunks += b"\x00"
        p = str(tmp_path / f"hand{bits}.aiff")
        with open(p, "wb") as f:
            f.write(b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks)
        data, rate = aiff.read_aiff(p)
        assert rate == 48000
        np.testing.assert_array_equal(
            data[0], (ints / float(1 << (bits - 1))).astype(np.float32)
        )


def test_aifc_sowt_little_endian(tmp_path):
    """AIFC 'sowt' (little-endian 16-bit) — the common Mac variant."""
    sig = _sig(0.25)
    n = sig.shape[1]
    ints = np.round(np.clip(sig.T, -1, 1) * 32768).clip(-32768, 32767)
    payload = ints.astype("<i2").tobytes()
    comm = (
        struct.pack(">HIH", 2, n, 16)
        + bytes.fromhex("400ebb800000000000000000")[:10]
        + b"sowt"
        + b"\x00\x00"  # empty pstring name (padded)
    )
    ssnd = struct.pack(">II", 0, 0) + payload
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    p = str(tmp_path / "sowt.aifc")
    with open(p, "wb") as f:
        f.write(b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFC" + chunks)
    data, rate = aiff.read_aiff(p)
    assert rate == 48000
    np.testing.assert_array_equal(data, (ints.T / np.float32(32768.0)).astype(np.float32))


def test_unsupported_aifc_compression(tmp_path):
    comm = (
        struct.pack(">HIH", 1, 10, 16)
        + bytes.fromhex("400ebb800000000000000000")[:10]
        + b"ima4"
        + b"\x00\x00"
    )
    ssnd = struct.pack(">II", 0, 0) + bytes(20)
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    p = str(tmp_path / "ima4.aifc")
    with open(p, "wb") as f:
        f.write(b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFC" + chunks)
    with pytest.raises(ValueError, match="unsupported AIFC compression.*ima4"):
        aiff.AiffStream(p)


def test_dispatch_through_audiosource(tmp_path):
    sig = _sig()
    p = str(tmp_path / "d.aiff")
    aiff.write_aiff(p, sig, 48000, bits=16)
    assert aiff.is_aiff_file(p)
    assert sniff_container(p) == "aiff"
    buf = AudioBuffer.load_from_file(p)
    np.testing.assert_array_equal(buf.channel_pcm, _quant(sig, 16))
    src = AudioSource.open_stream(p)
    assert src.is_stream and src.sample_rate == 48000
    np.testing.assert_array_equal(src.read(256), _quant(sig, 16)[:, :256])


def _hand_file(tmp_path, name, comm, payload):
    ssnd = struct.pack(">II", 0, 0) + payload
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        chunks += b"\x00"
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks)
    return p


def test_sub_1hz_rate_is_a_parse_error(tmp_path):
    """A COMM rate in (0, 1) must fail at parse time, not round to a zero
    sample_rate that divides-by-zero later (review finding)."""
    # 0.3 Hz ~= 0x3FFD 999999999999999A
    comm = struct.pack(">HIH", 1, 10, 16) + bytes.fromhex("3ffd999999999999999a")
    p = _hand_file(tmp_path, "slow.aiff", comm, bytes(20))
    with pytest.raises(ValueError, match="bad AIFF COMM"):
        aiff.AiffStream(p)


def test_zero_framecount_placeholder_is_empty(tmp_path):
    """COMM numSampleFrames=0 (an aborted writer's unpatched placeholder)
    decodes as an EMPTY stream, never as whatever bytes SSND declares."""
    comm = struct.pack(">HIH", 1, 0, 16) + bytes.fromhex("400ebb800000000000000000")[:10]
    p = _hand_file(tmp_path, "ph.aiff", comm, bytes(200))
    with aiff.AiffStream(p) as s:
        assert s.n_frames == 0
        assert s.read(100).shape == (1, 0)


def test_truncated_aiff_fails_cleanly(tmp_path):
    sig = _sig(0.1)
    p = str(tmp_path / "t.aiff")
    aiff.write_aiff(p, sig, 48000)
    raw = open(p, "rb").read()
    q = str(tmp_path / "trunc.aiff")
    with open(q, "wb") as f:
        f.write(raw[:20])  # FORM header + partial COMM
    with pytest.raises((ValueError, IOError)):
        aiff.read_aiff(q)
