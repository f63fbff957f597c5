"""Multiplexed daemon: protocol, per-stream recordings, and equivalence
with the single-stream daemon fed the same audio — including audio whose
length is NOT a multiple of the 0.5 s chunk (the sub-chunk tail must land
in the ring immediately, like the solo path, so deferred recordings
finalize at the same sample)."""

import io
import json
import os
import sys

import numpy as np
import pytest

from formula_vad_tpu.apps.daemon import Daemon
from formula_vad_tpu.apps.multidaemon import MultiDaemon
from formula_vad_tpu.io_.wav import write_wav

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)
import make_synthetic_corpus  # noqa: E402

# Deliberately NOT chunk-aligned: 23.37 s = 46 chunks + 17760 samples tail.
SECONDS = 23.37


@pytest.fixture(scope="module")
def corpus_wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("mdaemon")
    paths = []
    rng = np.random.default_rng(31)
    for i in range(2):
        audio, _ = make_synthetic_corpus.synth_stream(rng, SECONDS)
        p = str(d / f"s{i}.wav")
        write_wav(p, audio, 48000)
        paths.append(p)
    return paths


def _events(out):
    return [json.loads(l) for l in out.getvalue().strip().splitlines() if l]


def test_per_stream_recordings_match_solo_daemons(corpus_wavs, tmp_path):
    # Two solo daemons (the reference shape: one process per stream).
    solo_events = []
    solo_writes = []
    for i, p in enumerate(corpus_wavs):
        out = io.StringIO()
        d_dir = tmp_path / f"solo{i}"
        d_dir.mkdir()
        d = Daemon("SOLO", str(d_dir), "spectral_gate", stdout=out)
        d.process_line(json.dumps(
            {"action": "segment", "file_path": p, "playhead_timestamp_ms": 1000 * i}
        ))
        solo_events.append([e for e in _events(out) if e["action"] == "recording"])
        solo_writes.append(d.pipeline.total_write_count)

    # One multiplexed daemon serving both.
    out = io.StringIO()
    m_dir = tmp_path / "multi"
    m_dir.mkdir()
    md = MultiDaemon("MULTI", str(m_dir), ["a", "b"], "spectral_gate", stdout=out)
    for i, (s, p) in enumerate(zip(["a", "b"], corpus_wavs)):
        md.process_line(json.dumps(
            {"action": "segment", "stream": s, "file_path": p,
             "playhead_timestamp_ms": 1000 * i}
        ))
    events = _events(out)
    assert not [e for e in events if e["action"] == "error"]
    recs = [e for e in events if e["action"] == "recording"]
    assert recs, "expected at least one recording"

    # The rings must hold EVERY sample, sub-chunk tail included (the solo
    # path's cadence), so deferred stops finalize identically.
    for i in range(2):
        assert md.server.pipelines[i].total_write_count == solo_writes[i]
        assert solo_writes[i] == int(SECONDS * 48000)

    # Same detections per stream as the solo daemons: playhead, duration,
    # and the recorded file names (start-frame-stamped) must all agree.
    for stream, solo in zip(["a", "b"], solo_events):
        mine = [e for e in recs if e["stream"] == stream]
        assert [
            (os.path.basename(e["file_path"]), e["playhead_timestamp_ms"], e["duration_ms"])
            for e in mine
        ] == [
            (os.path.basename(e["file_path"]), e["playhead_timestamp_ms"], e["duration_ms"])
            for e in solo
        ]
        for e in mine:
            assert os.path.exists(e["file_path"])
            assert f"/{stream}/" in e["file_path"]


def test_protocol_errors_nonfatal(tmp_path):
    out = io.StringIO()
    md = MultiDaemon("M", str(tmp_path), ["x"], "spectral_gate", stdout=out)
    md.process_line("not json")
    md.process_line(json.dumps({"action": "segment", "file_path": "f.wav"}))  # no stream
    md.process_line(json.dumps({"action": "segment", "stream": "nope", "file_path": "f.wav"}))
    md.process_line(json.dumps({"action": "bogus", "stream": "x"}))
    md.process_line(json.dumps({"action": "segment", "stream": "x"}))  # no file_path
    md.process_line(json.dumps({"action": "segment", "stream": "x", "file_path": "f.wav"}))
    md.process_line(json.dumps(
        {"action": "segment", "stream": "x", "file_path": "/nonexistent.wav",
         "playhead_timestamp_ms": 0}
    ))
    events = _events(out)
    assert len(events) == 7
    assert all(e["action"] == "error" and not e["fatal"] for e in events)
    # The reference's distinct per-field messages (main.zig:224-235), shared
    # with the solo daemon via load_segment_audio.
    assert "Missing file_path" in events[4]["message"]
    assert "Missing playhead_timestamp_ms" in events[5]["message"]


def test_sr_mismatch_drops_only_that_stream(tmp_path):
    """A fatal sample-rate mismatch kills a solo daemon (main.zig:259-270);
    the multidaemon contains it to the offending stream — the fatal error is
    emitted stream-tagged, later commands to that stream are rejected
    non-fatally, and the other streams keep serving."""
    bad = str(tmp_path / "bad_sr.wav")
    write_wav(bad, np.zeros((2, 4410), np.float32), 44100)
    out = io.StringIO()
    md = MultiDaemon("M", str(tmp_path), ["x", "y"], "spectral_gate", stdout=out)
    md.process_line(json.dumps(
        {"action": "segment", "stream": "x", "file_path": bad,
         "playhead_timestamp_ms": 0}
    ))
    events = _events(out)
    assert events[-1]["fatal"] and events[-1]["stream"] == "x"
    assert "x" in md.dropped and "y" not in md.dropped

    # Stream x is dead: commands are ignored with a non-fatal error.
    md.process_line(json.dumps({"action": "skip_segment", "stream": "x"}))
    assert not _events(out)[-1]["fatal"]
    assert "dropped" in _events(out)[-1]["message"]

    # Stream y still works end-to-end.
    md.process_line(json.dumps({"action": "skip_segment", "stream": "y"}))
    assert len(_events(out)) == 2  # no new error from y's skip
