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


def test_state_failover_resumes_bit_identically(corpus_wavs, tmp_path):
    """A multidaemon killed between commands and restarted with --state must
    produce exactly the events of an uninterrupted run — including deferred
    recordings in flight at the checkpoint (non-chunk-aligned audio) and
    per-stream playhead correlation."""
    streams = ["x", "y"]
    cmds = [
        {"action": "segment", "stream": "x", "file_path": corpus_wavs[0],
         "playhead_timestamp_ms": 0},
        {"action": "segment", "stream": "y", "file_path": corpus_wavs[1],
         "playhead_timestamp_ms": 100},
        {"action": "segment", "stream": "x", "file_path": corpus_wavs[1],
         "playhead_timestamp_ms": 40000},
        {"action": "skip_segment", "stream": "y"},
        {"action": "segment", "stream": "y", "file_path": corpus_wavs[0],
         "playhead_timestamp_ms": 90000},
    ]

    # Uninterrupted reference run.
    out_a = io.StringIO()
    dir_a = tmp_path / "a"
    for s in streams:
        os.makedirs(dir_a / s, exist_ok=True)
    md = MultiDaemon("M", str(dir_a), streams, "spectral_gate", stdout=out_a)
    md.run(stdin=io.StringIO("".join(json.dumps(c) + "\n" for c in cmds)))

    # Same commands split across a restart with --state.
    out_b = io.StringIO()
    dir_b = tmp_path / "b"
    state = str(tmp_path / "state")
    for s in streams:
        os.makedirs(dir_b / s, exist_ok=True)
    md1 = MultiDaemon("M", str(dir_b), streams, "spectral_gate", stdout=out_b,
                      state_dir=state)
    md1.run(stdin=io.StringIO("".join(json.dumps(c) + "\n" for c in cmds[:2])))
    md2 = MultiDaemon("M", str(dir_b), streams, "spectral_gate", stdout=out_b,
                      state_dir=state)
    md2.run(stdin=io.StringIO("".join(json.dumps(c) + "\n" for c in cmds[2:])))

    ev_a = _events(out_a)
    ev_b = _events(out_b)
    # Identical apart from the output directory in file paths.
    norm = lambda evs: [
        {**e, "file_path": e.get("file_path", "").replace(str(dir_b), str(dir_a))}
        for e in evs
    ]
    assert norm(ev_b) == ev_a
    assert any(e["action"] == "recording" for e in ev_a), "must exercise recordings"

    # Mismatched stream lists are rejected cleanly.
    out_c = io.StringIO()
    md3 = MultiDaemon("M", str(dir_b), ["x", "z"], "spectral_gate", stdout=out_c,
                      state_dir=state)
    md3.process_line("")  # construct only; resume happens in run()
    md3.run(stdin=io.StringIO(""))
    errs = [e for e in _events(out_c) if e["action"] == "error"]
    assert errs and "streams" in errs[0]["message"]


def test_orphaned_staging_dirs_pruned(corpus_wavs, tmp_path):
    """A crash mid-save leaves a fleet-sized .stage-<oldpid> dir; the next
    completed save (any PID) must prune it, or every crash/restart cycle
    leaks a full checkpoint's worth of disk in the state dir."""
    streams = ["x"]
    outdir = tmp_path / "o"
    os.makedirs(outdir / "x", exist_ok=True)
    state = tmp_path / "state"
    os.makedirs(state)
    orphan = state / ".stage-99999"
    os.makedirs(orphan)
    (orphan / "carries.npz").write_bytes(b"torn write from a killed process")

    out = io.StringIO()
    md = MultiDaemon("M", str(outdir), streams, "spectral_gate", stdout=out,
                     state_dir=str(state))
    md.run(stdin=io.StringIO(json.dumps(
        {"action": "segment", "stream": "x", "file_path": corpus_wavs[0],
         "playhead_timestamp_ms": 0}) + "\n"))

    entries = sorted(os.listdir(state))
    assert not any(e.startswith(".stage-") for e in entries), entries
    assert "LATEST" in entries and any(e.startswith("gen-") for e in entries)


def test_stats_action(corpus_wavs, tmp_path):
    """{"action": "stats"} emits fleet tick-latency stats (no stream field
    needed); counters reflect the ticks the pushed audio produced."""
    out = io.StringIO()
    md = MultiDaemon("M", str(tmp_path / "s"), ["x", "y"], "spectral_gate", stdout=out)

    md.process_line(json.dumps({"action": "stats"}))
    md.process_line(json.dumps(
        {"action": "segment", "stream": "x", "file_path": corpus_wavs[0],
         "playhead_timestamp_ms": 0}))
    md.process_line(json.dumps({"action": "stats"}))

    stats = [e for e in _events(out) if e["action"] == "stats"]
    assert len(stats) == 2
    first, second = stats
    assert first["ticks"] == 0 and "last_ms" not in first
    assert first["budget_ms"] == 500.0 and first["streams"] == 2
    # 23.37 s of audio = 46 full chunks -> 46 ticks before the second stats.
    assert second["ticks"] == 46 and second["window"] == 46
    assert second["last_ms"] > 0
    assert second["p50_ms"] <= second["p95_ms"] <= second["max_ms"]
    assert second["dropped"] == [] and second["commands_processed"] == 2
