"""Fault injection: SIGKILL a multidaemon mid-corpus, resume from --state.

The whole-fleet failover claim (multidaemon ``--state``) had only been
exercised across CLEAN exits. Here a real OS process serving two streams
is SIGKILLed while processing a segment command (no shutdown hook runs),
a fresh process resumes from the crash-atomic ``--checkpoint-every``
generation checkpoint, the supervisor replays stdin from the last ACKED
``commands_processed``, and the combined event stream must be
byte-identical to an uninterrupted run.

Exactly-once contract (multidaemon.py): events a killed process emitted
AFTER its last checkpoint ack are the supervisor's to discard — the ack
is the durability point. This test truncates at the last ack, exactly as
a production supervisor would.
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from formula_vad_tpu.io_.wav import write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))
import make_synthetic_corpus  # noqa: E402

STREAMS = "x,y"
SECONDS = 23.37  # non-chunk-aligned: deferred recordings stay in flight


@pytest.fixture(scope="module")
def corpus_wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("killcorpus")
    rng = np.random.default_rng(77)
    paths = []
    for i in range(2):
        audio, _ = make_synthetic_corpus.synth_stream(rng, SECONDS)
        p = str(d / f"k{i}.wav")
        write_wav(p, audio, 48000)
        paths.append(p)
    return paths


class _Daemon:
    """A real multidaemon subprocess with a stdout-collecting thread."""

    def __init__(self, out_dir: str, state_dir: str, checkpoint_every: int = 1):
        self.proc = subprocess.Popen(
            [
                sys.executable, os.path.join(REPO, "tests", "multidaemon_worker.py"),
                "-o", out_dir, "-n", "KILLTEST", "--streams", STREAMS,
                "--denoiser", "spectral_gate", "--state", state_dir,
                "--checkpoint-every", str(checkpoint_every),
            ],
            cwd=REPO,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        self.lines: list[str] = []
        self._reader = threading.Thread(target=self._pump, daemon=True)
        self._reader.start()

    def _pump(self):
        for line in self.proc.stdout:
            self.lines.append(line.rstrip("\n"))

    def send(self, cmd: dict):
        self.proc.stdin.write(json.dumps(cmd) + "\n")
        self.proc.stdin.flush()

    def wait_for_ack(self, k: int, timeout: float = 420.0):
        """Block until the checkpoint ack for commands_processed == k."""
        deadline = time.monotonic() + timeout
        want = {"action": "checkpoint", "commands_processed": k}
        while time.monotonic() < deadline:
            for line in list(self.lines):
                try:
                    if json.loads(line) == want:
                        return
                except json.JSONDecodeError:
                    pass
            if self.proc.poll() is not None:
                raise AssertionError(
                    f"daemon died (rc={self.proc.returncode}) awaiting ack {k}:\n"
                    + self.proc.stderr.read()[-4000:]
                )
            time.sleep(0.05)
        raise AssertionError(f"no checkpoint ack for command {k} in {timeout}s")

    def finish(self, timeout: float = 420.0) -> list[str]:
        self.proc.stdin.close()
        rc = self.proc.wait(timeout=timeout)
        self._reader.join(timeout=30)
        assert rc == 0, f"daemon exited rc={rc}:\n" + self.proc.stderr.read()[-4000:]
        return list(self.lines)

    def kill(self):
        self.proc.send_signal(signal.SIGKILL)
        self.proc.wait(timeout=60)
        self._reader.join(timeout=30)
        self.proc.stderr.close()
        self.proc.stdin.close()


def _commands(corpus_wavs):
    return [
        {"action": "segment", "stream": "x", "file_path": corpus_wavs[0],
         "playhead_timestamp_ms": 0},
        {"action": "segment", "stream": "y", "file_path": corpus_wavs[1],
         "playhead_timestamp_ms": 500},
        {"action": "segment", "stream": "x", "file_path": corpus_wavs[1],
         "playhead_timestamp_ms": 40000},
        {"action": "skip_segment", "stream": "y"},
        {"action": "segment", "stream": "y", "file_path": corpus_wavs[0],
         "playhead_timestamp_ms": 90000},
        {"action": "segment", "stream": "x", "file_path": corpus_wavs[0],
         "playhead_timestamp_ms": 130000},
    ]


def _norm(lines: list[str], out_dir: str) -> list[str]:
    """Event lines with the run-specific output directory scrubbed."""
    return [l.replace(out_dir, "OUT") for l in lines if l.strip()]


def test_sigkill_mid_corpus_resumes_byte_identically(corpus_wavs, tmp_path):
    cmds = _commands(corpus_wavs)

    # --- uninterrupted reference run (same checkpoint cadence) --------------
    out_a = str(tmp_path / "out_a")
    os.makedirs(out_a)
    ref = _Daemon(out_a, str(tmp_path / "state_a"))
    for c in cmds:
        ref.send(c)
    ev_a = _norm(ref.finish(), out_a)

    # --- run B: SIGKILL while command 4 is being processed -------------------
    out_b = str(tmp_path / "out_b")
    state_b = str(tmp_path / "state_b")
    os.makedirs(out_b)
    d1 = _Daemon(out_b, state_b)
    for c in cmds[:3]:
        d1.send(c)
    d1.wait_for_ack(3)
    d1.send(cmds[3])  # in flight when the SIGKILL lands
    time.sleep(0.3)
    d1.kill()

    # Supervisor view: keep only output up to the last checkpoint ack.
    acked = 0
    kept_upto = 0
    kept: list[str] = []
    for line in d1.lines:
        kept.append(line)
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("action") == "checkpoint":
            acked = ev["commands_processed"]
            kept_upto = len(kept)
    kept = kept[:kept_upto]
    assert acked >= 3, f"expected >=3 durable commands, got {acked}"

    # --- resume: a fresh process replays from the durable point --------------
    d2 = _Daemon(out_b, state_b)
    for c in cmds[acked:]:
        d2.send(c)
    ev_b = _norm(kept, out_b) + _norm(d2.finish(), out_b)

    assert ev_b == ev_a
    recs = [json.loads(l) for l in ev_a if '"recording"' in l]
    assert recs, "corpus must produce recordings to make the test meaningful"
    # Every announced recording file exists in run B's outdir too (re-written
    # on replay if the kill interrupted the original write).
    for e in recs:
        assert os.path.exists(e["file_path"].replace("OUT", out_b))


def test_checkpoint_generations_atomic(tmp_path, corpus_wavs):
    """Unit-level guarantees of the crash-atomic checkpoint format: a stale
    staging dir (a kill mid-save) is ignored, LATEST always names a complete
    generation, and superseded generations are pruned."""
    import io

    from formula_vad_tpu.apps.multidaemon import MultiDaemon

    state = tmp_path / "state"
    state.mkdir()
    out = io.StringIO()
    md = MultiDaemon("M", str(tmp_path), ["x", "y"], "spectral_gate",
                     stdout=out, state_dir=str(state), checkpoint_every=1)
    md.process_line(json.dumps(
        {"action": "segment", "stream": "x", "file_path": corpus_wavs[0],
         "playhead_timestamp_ms": 0}))
    md.process_line(json.dumps({"action": "skip_segment", "stream": "x"}))

    gens = [e for e in os.listdir(state) if e.startswith("gen-")]
    assert len(gens) == 1, gens  # superseded generation pruned
    latest = (state / "LATEST").read_text().strip()
    assert latest == gens[0]

    # Simulate a kill mid-save: a torn staging dir must not break resume.
    (state / ".stage-99999").mkdir()
    (state / ".stage-99999" / "multidaemon.json").write_text("{ torn")

    out2 = io.StringIO()
    md2 = MultiDaemon("M", str(tmp_path), ["x", "y"], "spectral_gate",
                      stdout=out2, state_dir=str(state), checkpoint_every=1)
    md2.load_state()
    assert md2.commands_processed == 2
    assert md2.correlated_sample_index == md.correlated_sample_index
