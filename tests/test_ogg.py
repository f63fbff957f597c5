"""Ogg Vorbis codec tests (io_/ogg.py + native/fvadogg.cpp).

Covers the reference's libsndfile OGG paths: Vorbis decode of input audio
(AudioFileStream.zig), VBR clip encoding (AudioBuffer.zig:61-116,
SimulationInstance.zig:37-68 — quality 1.0, ``{start}-{kind}.ogg`` naming).
"""

import os

import numpy as np
import pytest

from formula_vad_tpu.io_ import ogg
from formula_vad_tpu.io_.audio import AudioBuffer, AudioSource

pytestmark = pytest.mark.skipif(
    not ogg.available(), reason="system Vorbis codec unavailable"
)

# A real-world Vorbis file produced by a real encoder (ships with pygame) —
# validates the decoder against foreign encodings, not just our own.
REAL_OGG = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"


def _tone(rate=48000, seconds=2.0, freqs=(440.0, 880.0)):
    t = np.arange(int(rate * seconds)) / rate
    return np.stack([0.3 * np.sin(2 * np.pi * f * t) for f in freqs]).astype(
        np.float32
    )


class TestRoundTrip:
    def test_encode_decode_snr_and_exact_length(self, tmp_path):
        pcm = _tone()
        path = str(tmp_path / "t.ogg")
        ogg.write_ogg(path, pcm, 48000, quality=1.0)
        got, rate = ogg.read_ogg(path)
        assert rate == 48000
        # Vorbis preserves the exact sample count via end granulepos trimming.
        assert got.shape == pcm.shape
        err = got - pcm
        snr = 10 * np.log10(np.mean(pcm**2) / max(np.mean(err**2), 1e-20))
        assert snr > 25.0, f"round-trip SNR too low: {snr:.1f} dB"

    def test_mono_and_quality_ladder(self, tmp_path):
        pcm = _tone(freqs=(500.0,))
        sizes = {}
        for q in (0.1, 1.0):
            path = str(tmp_path / f"q{q}.ogg")
            ogg.write_ogg(path, pcm, 48000, quality=q)
            got, rate = ogg.read_ogg(path)
            assert got.shape == pcm.shape and rate == 48000
            sizes[q] = os.path.getsize(path)
        assert sizes[1.0] > sizes[0.1], "higher VBR quality must spend more bits"

    def test_streaming_chunked_equals_whole_and_seek(self, tmp_path):
        pcm = _tone(seconds=1.5)
        path = str(tmp_path / "s.ogg")
        ogg.write_ogg(path, pcm, 48000)
        whole, _ = ogg.read_ogg(path)
        with ogg.OggStream(path) as s:
            assert (s.sample_rate, s.n_channels, s.n_frames) == (48000, 2, pcm.shape[1])
            assert s.duration_seconds() == pytest.approx(1.5)
            parts = []
            while True:
                chunk = s.read(10007)  # deliberately odd chunk size
                if chunk.shape[1] == 0:
                    break
                parts.append(chunk)
            assert np.array_equal(np.concatenate(parts, axis=1), whole)
            s.seek_to_sample(48000)
            tail = s.read(s.n_frames)
            assert np.array_equal(tail, whole[:, 48000:])


class TestChainedStreams:
    def test_channel_change_stops_at_link_boundary(self, tmp_path):
        """A chained file whose channel count changes mid-stream must not
        read past the first link's channel layout (OOB guard in
        fvad_ogg_read_planar); decode stops at the boundary."""
        stereo = _tone(seconds=0.5)
        mono = _tone(seconds=0.5, freqs=(700.0,))
        p1, p2 = str(tmp_path / "a.ogg"), str(tmp_path / "b.ogg")
        ogg.write_ogg(p1, stereo, 48000)
        ogg.write_ogg(p2, mono, 48000)
        chained = str(tmp_path / "chain.ogg")
        with open(chained, "wb") as f:
            f.write(open(p1, "rb").read() + open(p2, "rb").read())
        with ogg.OggStream(chained) as s:
            assert s.n_channels == 2  # first link's layout
            data = s.read(s.n_frames)
        assert data.shape[0] == 2
        # everything returned comes from the first (stereo) link
        assert data.shape[1] <= stereo.shape[1]


class TestRealWorldDecode:
    @pytest.mark.skipif(not os.path.exists(REAL_OGG), reason="fixture absent")
    def test_decode_foreign_file(self):
        data, rate = ogg.read_ogg(REAL_OGG)
        assert rate > 0 and data.shape[0] >= 1 and data.shape[1] > rate // 2
        assert np.isfinite(data).all()
        rms = float(np.sqrt(np.mean(data**2)))
        assert 0.01 < rms < 1.0, f"implausible decoded RMS {rms}"


class TestIntegration:
    def test_audio_buffer_and_source_dispatch(self, tmp_path):
        pcm = _tone(seconds=0.5)
        path = str(tmp_path / "clip.ogg")
        AudioBuffer(pcm, 48000).save_to_file(path, fmt="ogg")
        buf = AudioBuffer.load_from_file(path)
        assert buf.sample_rate == 48000 and buf.channel_pcm.shape == pcm.shape
        src = AudioSource.open_stream(path)
        assert src.is_stream and src.sample_rate == 48000 and src.n_channels == 2
        chunk = src.read(1000)
        assert chunk.shape == (2, 1000)
        src.close()
        pre = AudioSource.preload(path)
        assert not pre.is_stream and pre.read_all().shape == pcm.shape

    def test_sniff_rejects_wav(self, tmp_path):
        from formula_vad_tpu.io_.wav import write_wav

        path = str(tmp_path / "a.wav")
        write_wav(path, _tone(seconds=0.1), 48000)
        assert not ogg.is_ogg_file(path)
        src = AudioSource.open_stream(path)  # still dispatches to WavStream
        assert src.sample_rate == 48000
        src.close()


def test_closed_stream_guards(tmp_path):
    """read() AND seek_to_sample() must raise a clean ValueError on a closed
    stream — an unguarded seek passed NULL to the native decoder (SIGSEGV)."""
    pcm = _tone(seconds=0.2)
    path = str(tmp_path / "c.ogg")
    ogg.write_ogg(path, pcm, 48000)
    s = ogg.OggStream(path)
    s.close()
    with pytest.raises(ValueError, match="closed"):
        s.read(100)
    with pytest.raises(ValueError, match="closed"):
        s.seek_to_sample(0)
    s.close()  # idempotent
