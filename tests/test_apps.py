"""End-to-end app tests: batched runner (on the 8-device CPU mesh), host
streaming pipeline parity, simulator CLI, evaluator CLI, daemon protocol."""

import io
import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from formula_vad_tpu.config import (
    PipelineConfig,
    SimConfig,
    VADConfig,
    VADMachineConfig,
)
from formula_vad_tpu.io_.wav import write_wav
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.parallel.runner import BatchRunner
from formula_vad_tpu.pipeline import vad
from formula_vad_tpu.pipeline.pipeline import AudioPipeline, Callbacks

CFG = VADMachineConfig(long_term_speech_avg_sec=10.0)


@pytest.fixture(scope="module")
def params():
    return nsnet2.init_params(jax.random.PRNGKey(7))


def speechy_audio(n_chunks, bursts, seed=0, gain=1.0):
    rng = np.random.default_rng(seed)
    t_total = n_chunks * 24000
    t = np.arange(t_total) / 48000.0
    base = 0.003 * rng.standard_normal((2, t_total))
    env = np.zeros(t_total)
    for start_s, dur_s in bursts:
        i0, i1 = int(start_s * 48000), int((start_s + dur_s) * 48000)
        env[i0 : min(i1, t_total)] = 1.0
    speech = (0.25 * np.sin(2 * np.pi * 700 * t) + 0.15 * np.sin(2 * np.pi * 1300 * t)) * env
    return (base + gain * np.stack([speech, 0.9 * speech])).astype(np.float32)


class TestBatchRunner:
    def test_ragged_batch_matches_single_stream(self, params):
        """3 ragged streams batched over the 8-device mesh must each produce
        the same segments as an unbatched run."""
        assert len(jax.devices()) == 8  # virtual CPU mesh from conftest
        streams = [
            speechy_audio(12, [(2.0, 2.0)], seed=1),
            speechy_audio(8, [(1.0, 1.5)], seed=2),
            speechy_audio(10, [(0.5, 1.0), (3.5, 1.2)], seed=3),
        ]
        lengths = [s.shape[1] for s in streams]
        max_t = max(lengths)
        batch = np.zeros((3, 2, max_t), np.float32)
        for i, s in enumerate(streams):
            batch[i, :, : s.shape[1]] = s

        runner = BatchRunner(params, VADConfig(vad_machine_config=CFG))
        results = runner.run(batch, lengths)

        st = runner.st
        for i, s in enumerate(streams):
            carry, outs = jax.jit(lambda a: vad.process_stream(params, st, a))(s)
            expected = vad.segments_from_outputs(st, outs)
            got = results[i].segments
            assert got == expected, f"stream {i}: {got} != {expected}"

    def test_alt_config_sweep(self, params):
        """K alt machine configs run over one stream give the same segments as
        K separate runs (the reference's alt_vad_machine_configs)."""
        alt1 = CFG  # identical to primary
        alt2 = VADMachineConfig(
            long_term_speech_avg_sec=10.0, speech_threshold_factor=1000.0
        )  # effectively never triggers
        audio = speechy_audio(10, [(2.0, 2.0)], seed=4)
        runner = BatchRunner(
            params,
            VADConfig(vad_machine_config=CFG, alt_vad_machine_configs=(alt1, alt2)),
        )
        results = runner.run(audio[None])
        assert results[0].alt_segments[0] == results[0].segments
        assert results[0].alt_segments[1] == []


class TestHostPipelinePairity:
    def test_streaming_pipeline_matches_batch(self, params):
        """Host streaming pipeline (arbitrary push sizes) == device batch run."""
        audio = speechy_audio(16, [(2.0, 2.0)], seed=5)
        st = vad.statics_from_config(VADConfig(vad_machine_config=CFG))
        _, outs = jax.jit(lambda a: vad.process_stream(params, st, a))(audio)
        expected = vad.segments_from_outputs(st, outs)

        pipe = AudioPipeline(
            PipelineConfig(vad_config=VADConfig(vad_machine_config=CFG)), params=params
        )
        # push in awkward sizes (not chunk-aligned)
        pos = 0
        rng = np.random.default_rng(0)
        while pos < audio.shape[1]:
            n = int(rng.integers(1000, 100000))
            pipe.push_samples(audio[:, pos : pos + n])
            pos += n
        assert expected, "test audio must produce at least one segment"
        assert pipe.segments == expected

    def test_recordings_emitted(self, params):
        audio = speechy_audio(16, [(2.0, 2.0)], seed=6)
        recs = {"original": [], "denoised": []}
        pipe = AudioPipeline(
            PipelineConfig(vad_config=VADConfig(vad_machine_config=CFG)),
            params=params,
            callbacks=Callbacks(
                on_original_recording=lambda b: recs["original"].append(b),
                on_denoised_recording=lambda b: recs["denoised"].append(b),
            ),
        )
        pipe.push_samples(audio)
        assert len(recs["original"]) == len(pipe.segments) == 1
        assert len(recs["denoised"]) == 1
        buf = recs["original"][0]
        assert buf.n_channels == 1  # quietest-channel mono (Recorder.zig:113-128)
        seg = pipe.segments[0]
        assert buf.global_start_frame_number == seg["sample_from"]
        assert buf.length == seg["sample_to"] - seg["sample_from"]

    def test_skip_processing(self, params):
        pipe = AudioPipeline(
            PipelineConfig(skip_processing=True, vad_config=VADConfig(vad_machine_config=CFG)),
            params=params,
        )
        pipe.push_samples(np.zeros((2, 100000), np.float32))
        assert pipe.total_write_count == 100000
        assert pipe.segments == []


class TestSimulatorApp:
    def _write_plan(self, tmp_path, audio, refs, batch=True):
        wav_path = tmp_path / "audio.wav"
        write_wav(str(wav_path), audio, 48000)
        ref_path = tmp_path / "ref.txt"
        ref_path.write_text("".join(f"{a}\t{b}\tspeech\n" for a, b in refs))
        plan = {
            "instances": [
                {"name": "TestStream", "audio_path": "audio.wav", "ref_path": "ref.txt"}
            ],
            "config": {
                "output_dir": "out",
                "batch_streams": batch,
                "vad_config": {
                    "vad_machine_config": {"long_term_speech_avg_sec": 10.0}
                },
            },
        }
        plan_path = tmp_path / "plan.json"
        plan_path.write_text(json.dumps(plan))
        return plan_path

    def test_simulator_batched(self, tmp_path, capsys):
        from formula_vad_tpu.apps import simulator

        audio = speechy_audio(16, [(2.0, 2.0)], seed=8)
        plan = self._write_plan(tmp_path, audio, [(2.0, 4.0)])
        assert simulator.main(["-i", str(plan)]) == 0
        out = capsys.readouterr().out
        assert "=> Performance Report" in out
        assert "TestStream" in out
        # output dir created with report + audacity + plan copy
        out_root = tmp_path / "out"
        run_dirs = list(out_root.iterdir())
        assert len(run_dirs) == 1
        files = {p.name for p in run_dirs[0].iterdir()}
        assert "report.txt" in files
        assert "TestStream-audacity.txt" in files
        assert "plan.json" in files
        # the detected segment overlaps the reference -> TPR should be high
        report_txt = (run_dirs[0] / "report.txt").read_text()
        assert "100.0%" in report_txt

    def test_simulator_streaming_saves_clips(self, tmp_path, capsys):
        """Default clip format matches the reference: Ogg Vorbis, named
        {start_frame}-{original|denoised}.ogg (SimulationInstance.zig:37-68);
        WAV fallback when the system codec is unavailable."""
        from formula_vad_tpu.apps import simulator
        from formula_vad_tpu.io_ import ogg

        ext = "ogg" if ogg.available() else "wav"
        audio = speechy_audio(16, [(2.0, 2.0)], seed=8)
        plan = self._write_plan(tmp_path, audio, [(2.0, 4.0)], batch=False)
        assert simulator.main(["-i", str(plan)]) == 0
        run_dir = next((tmp_path / "out").iterdir())
        clips = list((run_dir / "TestStream").glob(f"*.{ext}"))
        names = {c.name.split("-")[1] for c in clips}
        assert names == {f"original.{ext}", f"denoised.{ext}"}
        if ext == "ogg":
            got, rate = ogg.read_ogg(str(clips[0]))
            assert rate == 48000 and got.shape[0] == 1 and got.shape[1] > 48000


class TestEvaluatorCli:
    def test_cli(self, tmp_path, capsys):
        from formula_vad_tpu.apps import evaluator_cli

        vad_txt = tmp_path / "vad.txt"
        ref_txt = tmp_path / "ref.txt"
        vad_txt.write_text("1.0\t3.0\tx\n")
        ref_txt.write_text("1.0\t3.0\tspeech\n")
        assert evaluator_cli.main(["-i", str(vad_txt), "-r", str(ref_txt)]) == 0
        out = capsys.readouterr().out
        assert "True positive rate   (TPR):  100.00 %" in out


class TestDaemon:
    def test_protocol(self, tmp_path, params, monkeypatch):
        from formula_vad_tpu.apps.daemon import Daemon

        # build a wav with speech; daemon loads nsnet2 via load(None) == seed 0
        audio = speechy_audio(16, [(2.0, 2.0)], seed=9)
        wav_path = str(tmp_path / "seg.wav")
        write_wav(wav_path, audio, 48000)

        out = io.StringIO()
        daemon = Daemon("TEST", str(tmp_path), None, stdout=out)
        # patch the machine config for a fast-adapting noise floor
        daemon.process_line(
            json.dumps({"action": "segment", "file_path": wav_path, "playhead_timestamp_ms": 1000})
        )
        daemon.process_line(json.dumps({"action": "skip_segment"}))
        lines = [json.loads(l) for l in out.getvalue().strip().splitlines() if l]
        # With default 180 s long-term window and random weights we can't
        # guarantee a recording; but protocol errors must not appear.
        assert all(l["action"] in ("recording", "error") for l in lines)
        assert not any(l["action"] == "error" for l in lines)

    def test_bad_command_reports_error(self, tmp_path):
        from formula_vad_tpu.apps.daemon import Daemon

        out = io.StringIO()
        daemon = Daemon("TEST", str(tmp_path), None, stdout=out)
        daemon.process_line("this is not json")
        daemon.process_line(json.dumps({"action": "segment"}))  # missing file_path
        daemon.process_line(
            json.dumps({"action": "segment", "file_path": "/nonexistent.wav", "playhead_timestamp_ms": 0})
        )
        lines = [json.loads(l) for l in out.getvalue().strip().splitlines()]
        assert len(lines) == 3
        assert all(l["action"] == "error" and not l["fatal"] for l in lines)


class TestHostPipelineAltConfigs:
    def test_alt_machines_in_streaming_mode(self, params):
        """The host pipeline runs alt state machines over the same stream
        (VADPipeline.zig:111-123): an identical alt config reproduces the
        primary segments; an impossible one produces none."""
        alt_same = CFG
        alt_never = VADMachineConfig(
            long_term_speech_avg_sec=10.0, speech_threshold_factor=1000.0
        )
        audio = speechy_audio(16, [(2.0, 2.0)], seed=6)
        pipe = AudioPipeline(
            PipelineConfig(
                vad_config=VADConfig(
                    vad_machine_config=CFG,
                    alt_vad_machine_configs=(alt_same, alt_never),
                )
            ),
            params=params,
        )
        pipe.push_samples(audio)
        assert pipe.segments, "primary machine must fire"
        assert pipe.alt_segments[0] == pipe.segments
        assert pipe.alt_segments[1] == []


class TestSyntheticCorpusExample:
    def test_generator_produces_runnable_plan(self, tmp_path):
        import importlib.util

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "make_synthetic_corpus",
            os.path.join(root, "examples", "make_synthetic_corpus.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod.main(["--out", str(tmp_path), "--streams", "2",
                         "--minutes", "0.5", "--seed", "1"]) == 0
        plan = json.loads((tmp_path / "plan.json").read_text())
        assert len(plan["instances"]) == 2
        assert plan["config"]["vad_config"]["denoiser_model_path"] == "spectral_gate"
        for inst in plan["instances"]:
            audio = tmp_path / inst["audio_path"]
            labels = (tmp_path / inst["ref_path"]).read_text().strip().splitlines()
            assert audio.exists() and audio.stat().st_size > 1000
            assert labels, "each stream must contain speech segments"
            a, b, tag = labels[0].split("\t")
            assert float(b) > float(a) and tag == "speech"


class TestDaemonHardening:
    """Round-3 review fixes: typed protocol validation and the
    unresumable-checkpoint refusal (mirrors multidaemon's FATAL rule)."""

    def test_bad_field_types_report_nonfatal_errors(self, tmp_path):
        from formula_vad_tpu.apps.daemon import Daemon

        out = io.StringIO()
        daemon = Daemon("TEST", str(tmp_path), None, stdout=out)
        # A string playhead would poison correlated_timestamp_ms (TypeError
        # hours later in a recording callback); an int file_path would make
        # open() treat it as a raw fd (0 == stdin).
        daemon.process_line(
            json.dumps(
                {"action": "segment", "file_path": "a.wav", "playhead_timestamp_ms": "1000"}
            )
        )
        daemon.process_line(
            json.dumps({"action": "segment", "file_path": 0, "playhead_timestamp_ms": 0})
        )
        daemon.process_line(
            json.dumps(
                {"action": "segment", "file_path": "a.wav", "playhead_timestamp_ms": True}
            )
        )
        lines = [json.loads(l) for l in out.getvalue().strip().splitlines()]
        assert len(lines) == 3
        assert all(l["action"] == "error" and not l["fatal"] for l in lines)

    def test_unresumable_state_is_fatal_and_not_clobbered(self, tmp_path):
        from formula_vad_tpu.apps.daemon import Daemon

        state = tmp_path / "state.npz"
        state.write_bytes(b"not an npz checkpoint")
        before = state.read_bytes()
        out = io.StringIO()
        daemon = Daemon("TEST", str(tmp_path), None, stdout=out, state_path=str(state))
        rc = daemon.run(stdin=io.StringIO(""))
        assert rc == 1
        lines = [json.loads(l) for l in out.getvalue().strip().splitlines()]
        assert any(l["action"] == "error" and l["fatal"] for l in lines)
        # The unreadable checkpoint must survive for the operator to fix —
        # serving fresh state would have overwritten it on exit.
        assert state.read_bytes() == before


def test_simulator_rejects_mono_sources(tmp_path):
    """A mono [1, T] source must error, not broadcast into both stereo rows
    (that forces the FSM's channel-volume ratio to 1.0 — silently different
    segments; the daemon path rejects the same mismatch)."""
    from formula_vad_tpu.apps import simulator

    mono = speechy_audio(4, [(0.5, 0.5)], seed=3)[:1]
    wav_path = tmp_path / "mono.wav"
    write_wav(str(wav_path), mono, 48000)
    (tmp_path / "ref.txt").write_text("0.5\t1.0\tspeech\n")
    plan = {
        "instances": [
            {"name": "Mono", "audio_path": "mono.wav", "ref_path": "ref.txt"}
        ],
        "config": {"batch_streams": True},
    }
    plan_path = tmp_path / "plan.json"
    plan_path.write_text(json.dumps(plan))
    with pytest.raises(ValueError, match="channels"):
        simulator.main(["-i", str(plan_path)])
