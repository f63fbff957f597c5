"""I/O robustness: malformed/truncated containers must fail with clean
ValueError/FileNotFoundError (or degrade gracefully) — never hang, crash
with confusing numpy/struct internals, or return undecoded garbage shapes.

The reference gets this behavior from libsndfile; this framework owns its
codecs (io_/wav.py + native/fvadio.cpp, io_/ogg.py + native/fvadogg.cpp),
so the contract needs its own tests.
"""

import os
import struct
import tempfile

import numpy as np
import pytest

from formula_vad_tpu.io_ import ogg
from formula_vad_tpu.io_.audio import AudioBuffer
from formula_vad_tpu.io_.wav import WavStream, read_wav, write_wav


def _wav_bytes(data: np.ndarray, rate: int = 48000) -> bytearray:
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    try:
        write_wav(path, data, rate)
        with open(path, "rb") as f:
            return bytearray(f.read())
    finally:
        os.unlink(path)


@pytest.fixture
def stereo():
    rng = np.random.default_rng(0)
    return (0.1 * rng.standard_normal((2, 480))).astype(np.float32)


class TestMalformedWav:
    def test_empty_file(self, tmp_path):
        p = tmp_path / "empty.wav"
        p.write_bytes(b"")
        with pytest.raises(ValueError):
            WavStream(str(p))

    def test_riff_only(self, tmp_path):
        p = tmp_path / "riff.wav"
        p.write_bytes(b"RIFF\x00\x00\x00\x00WAVE")
        with pytest.raises(ValueError):
            WavStream(str(p))

    def test_truncated_fmt_chunk(self, tmp_path):
        p = tmp_path / "shortfmt.wav"
        p.write_bytes(
            b"RIFF\x24\x00\x00\x00WAVE" + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
        )
        with pytest.raises(ValueError):
            WavStream(str(p))

    def test_zero_channels(self, stereo, tmp_path):
        raw = _wav_bytes(stereo)
        # fmt chunk starts at offset 12+8; channels field is 2 bytes at +2.
        raw[12 + 8 + 2 : 12 + 8 + 4] = struct.pack("<H", 0)
        p = tmp_path / "zch.wav"
        p.write_bytes(bytes(raw))
        with pytest.raises(ValueError):
            WavStream(str(p))

    def test_zero_rate(self, stereo, tmp_path):
        raw = _wav_bytes(stereo)
        raw[12 + 8 + 4 : 12 + 8 + 8] = struct.pack("<I", 0)
        p = tmp_path / "zrate.wav"
        p.write_bytes(bytes(raw))
        with pytest.raises(ValueError):
            WavStream(str(p))

    def test_truncated_data_degrades_gracefully(self, stereo, tmp_path):
        """data chunk header claims more frames than the file holds: the
        reader returns only the whole frames that exist."""
        raw = _wav_bytes(stereo)
        p = tmp_path / "trunc.wav"
        p.write_bytes(bytes(raw[: len(raw) - 101]))  # cut mid-frame
        with WavStream(str(p)) as s:
            got = s.read(s.n_frames)
        assert got.shape[0] == 2
        assert 0 < got.shape[1] < stereo.shape[1]
        np.testing.assert_array_equal(got, stereo[:, : got.shape[1]])

    def test_truncated_extensible_fmt(self, tmp_path):
        """EXTENSIBLE fmt chunk without room for the SubFormat GUID must be
        a clean ValueError, not a struct.error escaping into the caller."""
        body = struct.pack("<HHIIHH", 0xFFFE, 2, 48000, 0, 8, 32) + b"\x00" * 4
        p = tmp_path / "ext.wav"
        p.write_bytes(
            b"RIFF\x00\x01\x00\x00WAVE"
            + b"fmt " + struct.pack("<I", len(body)) + body
            + b"data" + struct.pack("<I", 0)
        )
        with pytest.raises(ValueError):
            WavStream(str(p))

    def test_float_tag_with_pcm_bits_rejected(self, stereo, tmp_path):
        """Format tag 3 (IEEE float) with bits=16 previously reinterpreted
        the payload as float64 garbage; the header parser must reject it."""
        raw = _wav_bytes(stereo)
        raw[12 + 8 + 0 : 12 + 8 + 2] = struct.pack("<H", 3)  # tag float
        raw[12 + 8 + 14 : 12 + 8 + 16] = struct.pack("<H", 16)  # bits 16
        p = tmp_path / "f16.wav"
        p.write_bytes(bytes(raw))
        with pytest.raises(ValueError):
            WavStream(str(p))

    def test_fuzzed_headers_raise_cleanly(self, stereo, tmp_path):
        """Random single-byte corruptions of the header: decode must either
        succeed or raise ValueError — nothing else, and no hangs."""
        base = _wav_bytes(stereo)
        rng = np.random.default_rng(7)
        path = str(tmp_path / "fuzz.wav")
        for _ in range(200):
            raw = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                raw[int(rng.integers(0, 44))] = int(rng.integers(0, 256))
            with open(path, "wb") as f:
                f.write(bytes(raw))
            try:
                data, rate = read_wav(path)
                assert data.ndim == 2  # survived corruption: sane shape
            except ValueError:
                pass  # clean rejection


class TestMalformedOgg:
    def test_garbage_with_ogg_magic(self, tmp_path):
        p = tmp_path / "bad.ogg"
        p.write_bytes(b"OggS" + bytes(range(256)) * 4)
        assert ogg.is_ogg_file(str(p))
        if not ogg.available():
            pytest.skip("system Vorbis codec not present")
        with pytest.raises((ValueError, OSError)):
            ogg.read_ogg(str(p))

    def test_audio_buffer_sniffs_and_rejects(self, tmp_path):
        p = tmp_path / "bad.ogg"
        p.write_bytes(b"OggS" + b"\x00" * 64)
        # Codec present: decode error (ValueError/OSError). Codec absent:
        # RuntimeError. Both are non-fatal in the daemon (apps/daemon.py).
        with pytest.raises((ValueError, OSError, RuntimeError)):
            AudioBuffer.load_from_file(str(p))


class TestLabelParsing:
    def test_malformed_lines_skipped(self):
        from formula_vad_tpu.eval.formats import parse_audacity_segments

        text = (
            "0.5\t1.5\tspeech\n"
            "not a label line\n"
            "2.0\tnot_a_float\tx\n"
            "\n"
            "3.0\t4.0\n"  # no label text: still two float fields
            "5.0\t6.0\tlast\r\n"  # CRLF
        )
        segs = parse_audacity_segments(text)
        assert [(s.from_sec, s.to_sec) for s in segs] == [
            (0.5, 1.5), (3.0, 4.0), (5.0, 6.0),
        ]


class TestOggFlacSniff:
    """Exact-offset Ogg-FLAC mapping detection (ADVICE r4): the 0x7f"FLAC"
    signature counts ONLY at the first packet's RFC 3533 position
    (27 + page_segments) — a Vorbis page whose random serial/granule/CRC
    bytes happen to contain the sequence must still route to Vorbis."""

    @staticmethod
    def _page(payload: bytes, granule: bytes = b"\x00" * 8,
              serial: bytes = b"\x01\x02\x03\x04") -> bytes:
        assert len(payload) < 255
        return (b"OggS" + b"\x00" + b"\x02" + granule + serial
                + b"\x00" * 4 + b"\x00" * 4  # page seq + crc
                + bytes([1, len(payload)]) + payload)

    def test_signature_in_granule_bytes_is_not_flac(self, tmp_path):
        from formula_vad_tpu.io_ import flac
        from formula_vad_tpu.io_.audio import sniff_container

        # 0x7f"FLAC" inside the granule field; first packet is Vorbis-id.
        page = self._page(b"\x01vorbis" + b"\x00" * 20,
                          granule=b"\x7fFLAC\x00\x00\x00")
        p = tmp_path / "tricky.ogg"
        p.write_bytes(page)
        assert not flac.is_ogg_flac_file(str(p))
        assert sniff_container(str(p)) == "ogg"

    def test_signature_at_first_packet_is_flac(self, tmp_path):
        from formula_vad_tpu.io_ import flac
        from formula_vad_tpu.io_.audio import sniff_container

        page = self._page(b"\x7fFLAC\x01\x00" + b"\x00" * 20)
        p = tmp_path / "real.oga"
        p.write_bytes(page)
        assert flac.is_ogg_flac_file(str(p))
        assert sniff_container(str(p)) == "flac"

    def test_truncated_ogg_header_routes_to_vorbis(self, tmp_path):
        from formula_vad_tpu.io_ import flac

        p = tmp_path / "trunc.ogg"
        p.write_bytes(b"OggS\x00\x02")  # shorter than one page header
        assert not flac.is_ogg_flac_file(str(p))


class TestFuzzedNewContainers:
    """Round-5 containers get the same single-byte header-corruption fuzz
    contract as WAV: decode either succeeds with a sane shape or raises
    ValueError — never another exception type, never a hang."""

    def _fuzz(self, base: bytes, reader, path, header_span: int, n: int = 200):
        rng = np.random.default_rng(11)
        for _ in range(n):
            raw = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                raw[int(rng.integers(0, header_span))] = int(rng.integers(0, 256))
            with open(path, "wb") as f:
                f.write(bytes(raw))
            try:
                data, _rate = reader(path)
                assert data.ndim == 2
            except ValueError:
                pass

    def test_caf_fuzz(self, tmp_path):
        from formula_vad_tpu.io_ import caf

        x = np.zeros((2, 64), np.float32)
        p = tmp_path / "f.caf"
        caf.write_caf(str(p), x, 8000, "pcm16")
        self._fuzz(p.read_bytes(), caf.read_caf, str(p), header_span=64)

    def test_w64_fuzz(self, tmp_path):
        from formula_vad_tpu.io_ import wav as wavmod

        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        payload = np.zeros(128, "<i2").tobytes()

        def chunk(guid, body):
            size = 24 + len(body)
            pad = (-size) % 8
            return guid + struct.pack("<Q", size) + body + b"\x00" * pad

        chunks = chunk(wavmod.W64_FMT, fmt) + chunk(wavmod.W64_DATA, payload)
        blob = (wavmod.W64_RIFF + struct.pack("<Q", 40 + len(chunks))
                + wavmod.W64_WAVE + chunks)
        p = tmp_path / "f.w64"
        self._fuzz(blob, read_wav, str(p), header_span=104)

    def test_g711_truncated_payload(self, tmp_path):
        """Truncated mu-law data: decode returns the whole frames present."""
        fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
        payload = bytes(range(200)) * 2
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", 1000) + payload  # claims 1000
        p = tmp_path / "trunc.wav"
        p.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)
        data, rate = read_wav(str(p))
        assert data.shape == (1, 400)  # only the 400 bytes actually present
