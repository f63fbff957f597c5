"""FLAC container support (VERDICT round-3 missing #4).

The reference accepts any container libsndfile decodes — FLAC included
(reference src/audio_utils/AudioFileStream.zig:22-83 via sf_open). These
tests pin the native driver (native/fvadflac.cpp over a dlopen'd libFLAC):
bit-exact 16-bit round-trip, sample-exact streaming seek, container-sniff
dispatch through AudioBuffer/AudioSource (the simulator/daemon input path),
and the two failure postures — unsupported containers fail with an
actionable error naming the supported set, and a missing libFLAC raises an
actionable RuntimeError instead of a cryptic parser error.
"""

import numpy as np
import pytest

from formula_vad_tpu.io_ import flac
from formula_vad_tpu.io_.audio import AudioBuffer, AudioSource, sniff_container

pytestmark = pytest.mark.skipif(
    not flac.available(), reason="libFLAC not found on this host"
)


def _sig(seconds=1.0, rate=48000):
    t = np.arange(int(seconds * rate)) / rate
    return np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.25 * np.sin(2 * np.pi * 880 * t)]
    ).astype(np.float32)


def _quant16(x):
    return (
        np.round(np.clip(x, -1, 1) * 32768).clip(-32768, 32767) / np.float32(32768.0)
    ).astype(np.float32)


def test_roundtrip_16bit_bitexact(tmp_path):
    sig = _sig()
    p = str(tmp_path / "a.flac")
    flac.write_flac(p, sig, 48000, bits=16)
    data, rate = flac.read_flac(p)
    assert rate == 48000
    assert data.shape == sig.shape
    # FLAC is lossless: decode == the encoder's 16-bit quantization, exactly.
    np.testing.assert_array_equal(data, _quant16(sig))


def test_roundtrip_24bit(tmp_path):
    sig = _sig(0.5)
    p = str(tmp_path / "a24.flac")
    flac.write_flac(p, sig, 48000, bits=24)
    data, _ = flac.read_flac(p)
    assert np.abs(data - sig).max() < 2 ** -22


def test_streaming_read_and_seek(tmp_path):
    sig = _sig(2.0)
    p = str(tmp_path / "s.flac")
    flac.write_flac(p, sig, 48000, bits=16)
    whole, _ = flac.read_flac(p)
    with flac.FlacStream(p) as s:
        assert s.sample_rate == 48000
        assert s.n_channels == 2
        assert s.n_frames == sig.shape[1]
        assert s.duration_seconds() == pytest.approx(2.0)
        a = s.read(1000)
        np.testing.assert_array_equal(a, whole[:, :1000])
        # Forward seek to a mid-frame sample (not a FLAC block boundary).
        s.seek_to_sample(12345)
        np.testing.assert_array_equal(s.read(500), whole[:, 12345:12845])
        # Backward seek.
        s.seek_to_sample(100)
        np.testing.assert_array_equal(s.read(50), whole[:, 100:150])
        # Read to EOF returns the exact tail then empty.
        s.seek_to_sample(sig.shape[1] - 70)
        assert s.read(1000).shape == (2, 70)
        assert s.read(1000).shape == (2, 0)


def test_mono_roundtrip(tmp_path):
    sig = _sig()[0:1]
    p = str(tmp_path / "m.flac")
    flac.write_flac(p, sig, 16000, bits=16)
    data, rate = flac.read_flac(p)
    assert rate == 16000
    np.testing.assert_array_equal(data, _quant16(sig))


def test_container_sniff_dispatch(tmp_path):
    """AudioBuffer.load_from_file / AudioSource.open_stream — the
    simulator/daemon input path — decode FLAC via the magic sniff."""
    sig = _sig()
    p = str(tmp_path / "d.flac")
    flac.write_flac(p, sig, 48000, bits=16)
    assert sniff_container(p) == "flac"
    assert flac.is_flac_file(p)

    buf = AudioBuffer.load_from_file(p)
    assert buf.sample_rate == 48000
    np.testing.assert_array_equal(buf.channel_pcm, _quant16(sig))

    src = AudioSource.open_stream(p)
    assert src.is_stream and src.sample_rate == 48000
    np.testing.assert_array_equal(src.read(256), _quant16(sig)[:, :256])

    pre = AudioSource.preload(p)
    np.testing.assert_array_equal(pre.read_all(), _quant16(sig))


def test_unsupported_container_actionable_error(tmp_path):
    """An AIFF-style (or any unknown-magic) input fails with an error that
    names the magic and the supported container set — the documented
    posture where the reference would have accepted it via libsndfile."""
    p = str(tmp_path / "weird.mid")
    with open(p, "wb") as f:
        f.write(b"MThd\x00\x00\x00\x06" + b"\x00" * 64)
    with pytest.raises(ValueError, match="unsupported audio container.*MThd.*WAV.*FLAC"):
        sniff_container(p)
    with pytest.raises(ValueError, match="unsupported audio container"):
        AudioBuffer.load_from_file(p)
    with pytest.raises(ValueError, match="unsupported audio container"):
        AudioSource.open_stream(p)


def test_truncated_flac_fails_cleanly(tmp_path):
    sig = _sig()
    p = str(tmp_path / "t.flac")
    flac.write_flac(p, sig, 48000, bits=16)
    raw = open(p, "rb").read()
    q = str(tmp_path / "trunc.flac")
    with open(q, "wb") as f:
        f.write(raw[:40])  # magic + partial STREAMINFO
    with pytest.raises((ValueError, IOError)):
        flac.read_flac(q)


def test_ogg_flac_container(tmp_path):
    """Ogg-embedded FLAC (the 'OggS' + 0x7f'FLAC' mapping libsndfile also
    accepts): sniffed as FLAC and either decoded (libFLAC built with Ogg
    support) or rejected with an actionable error naming the cause (the
    vendored libFLAC in this image lacks Ogg support — both paths are the
    contract)."""
    sig = _sig()
    p = str(tmp_path / "a.oga")
    try:
        flac.write_flac(p, sig, 48000, bits=16, container="ogg")
    except IOError:
        # Encoder lacks Ogg support => decoder does too. Handcraft the
        # container head to pin the sniff + rejection posture.
        with open(p, "wb") as f:
            f.write(b"OggS" + bytes(22) + b"\x01\x2f" + b"\x7fFLAC" + bytes(64))
        assert flac.is_ogg_flac_file(p)
        assert sniff_container(p) == "flac"
        with pytest.raises(ValueError, match="Ogg-FLAC.*lack Ogg support"):
            flac.FlacStream(p)
        return
    assert flac.is_ogg_flac_file(p)
    assert sniff_container(p) == "flac"
    data, rate = flac.read_flac(p)
    assert rate == 48000
    np.testing.assert_array_equal(data, _quant16(sig))


def test_plain_ogg_vorbis_still_sniffs_ogg(tmp_path):
    """A normal Ogg Vorbis file must keep routing to the Vorbis codec."""
    from formula_vad_tpu.io_ import ogg

    if not ogg.available():
        pytest.skip("Vorbis codec unavailable")
    p = str(tmp_path / "v.ogg")
    ogg.write_ogg(p, _sig(0.5), 48000, quality=0.5)
    assert sniff_container(p) == "ogg"
    assert not flac.is_ogg_flac_file(p)


def test_whole_file_read_is_chunked(tmp_path, monkeypatch):
    """read_flac fills a preallocated buffer in BOUNDED native reads (peak
    memory = one decoded copy, not file-sized FIFO + file-sized output —
    review finding on the 1-hour-preload path). A >4M-frame file must
    arrive in multiple reads, each <= the 4M-frame chunk, bit-exactly."""
    seconds = (1 << 22) / 48000 + 2.0  # just past one chunk
    sig = _sig(seconds)
    p = str(tmp_path / "c.flac")
    flac.write_flac(p, sig, 48000, bits=16)

    calls = []
    orig = flac.FlacStream.read

    def spy(self, n):
        calls.append(n)
        return orig(self, n)

    monkeypatch.setattr(flac.FlacStream, "read", spy)
    data, rate = flac.read_flac(p)
    assert rate == 48000
    np.testing.assert_array_equal(data, _quant16(sig))
    assert len(calls) >= 2 and max(calls) <= 1 << 22


@pytest.mark.parametrize("fmt", ["flac", "aiff"])
def test_simulator_runs_container_corpus(tmp_path, fmt):
    """End-to-end: a plan whose audio is FLAC/AIFF decodes through the
    streaming path (AudioSource.open_stream -> Flac/AiffStream) and scores
    — the exact scenario VERDICT r3 missing-#4 called out ('a plan
    pointing at FLAC would work there and fail here')."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "examples"))
    import make_synthetic_corpus as mc

    from formula_vad_tpu.apps import simulator

    out = str(tmp_path / "corpus")
    assert mc.main(["--out", out, "--streams", "1", "--minutes", "0.25",
                    "--format", fmt, "--denoiser", "spectral_gate"]) == 0
    assert any(f.endswith("." + fmt) for f in os.listdir(out))
    rc = simulator.main(["-i", os.path.join(out, "plan.json")])
    assert rc == 0
    run_dirs = [d for d in os.listdir(os.path.join(out, "out"))]
    assert run_dirs, "simulator must create a timestamped output dir"
    report = os.path.join(out, "out", sorted(run_dirs)[-1], "report.txt")
    assert os.path.exists(report)
    assert "synthetic-00" in open(report).read()


def test_missing_codec_posture(tmp_path, monkeypatch):
    """With no libFLAC loadable, readers raise an actionable RuntimeError
    (the daemon surfaces it as a non-fatal decode error)."""
    monkeypatch.setattr(flac, "_load", lambda: None)
    assert not flac.available()
    with pytest.raises(RuntimeError, match="FLAC codec unavailable.*FVAD_LIBFLAC"):
        flac.FlacStream(str(tmp_path / "missing.flac"))
