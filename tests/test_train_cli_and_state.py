"""Training CLI smoke, daemon state resume, simulator preload mode."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import PipelineConfig, VADConfig, VADMachineConfig
from formula_vad_tpu.io_.wav import write_wav
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.pipeline.pipeline import AudioPipeline

CFG = VADMachineConfig(long_term_speech_avg_sec=10.0)


def speechy(n_chunks, seed=0):
    rng = np.random.default_rng(seed)
    t_total = n_chunks * 24000
    t = np.arange(t_total) / 48000.0
    base = 0.003 * rng.standard_normal((2, t_total))
    env = np.zeros(t_total)
    env[2 * 48000 : 4 * 48000] = 1.0
    s = 0.3 * np.sin(2 * np.pi * 800 * t) * env
    return (base + np.stack([s, 0.9 * s])).astype(np.float32)


class TestTrainCli:
    def test_synthetic_training_produces_weights(self, tmp_path):
        from formula_vad_tpu.apps import train

        out = str(tmp_path / "w.npz")
        assert (
            train.main(
                ["--synthetic", "4", "--steps", "3", "--batch", "2",
                 "--frames", "8", "--out", out, "--tp", "2"]
            )
            == 0
        )
        loaded = nsnet2.load(out)
        assert np.asarray(loaded.fc_in_w).shape == (161, 400)

    def test_eval_flag_prints_quality_json(self, tmp_path, capsys):
        """--eval scores the checkpoint's denoising quality (SI-SDR
        improvement on held-out pairs) and prints one JSON line
        (VERDICT r4 next-#3: any retrained checkpoint reports it)."""
        import json

        from formula_vad_tpu.apps import train

        out = str(tmp_path / "w.npz")
        assert (
            train.main(
                ["--synthetic", "4", "--steps", "2", "--batch", "2",
                 "--frames", "8", "--out", out,
                 "--eval", "--eval-pairs", "1", "--eval-seconds", "8"]
            )
            == 0
        )
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        rec = json.loads(lines[-1])["denoise_quality"]
        assert rec["n_pairs"] == 1 and len(rec["pairs"]) == 1
        # A 2-step checkpoint has no quality bar — just a finite number
        # with both sides of the improvement present.
        row = rec["pairs"][0]
        assert np.isfinite(row["si_sdr_impr_db"])
        assert row["si_sdr_impr_db"] == pytest.approx(
            row["si_sdr_denoised_db"] - row["si_sdr_noisy_db"], abs=0.02
        )

    def test_onnx_output_round_trips(self, tmp_path):
        """--out model.onnx writes a real ONNX protobuf that the importer
        (and the original reference's ONNX Runtime path) can load."""
        from formula_vad_tpu.apps import train

        out = str(tmp_path / "w.onnx")
        assert (
            train.main(
                ["--synthetic", "4", "--steps", "2", "--batch", "2",
                 "--frames", "8", "--out", out, "--device-data"]
            )
            == 0
        )
        loaded = nsnet2.load(out)
        feats = jnp.asarray(
            np.random.default_rng(0).standard_normal((5, 161)), jnp.float32
        )
        assert np.isfinite(np.asarray(nsnet2.apply(loaded, feats))).all()

    def test_wav_pair_training(self, tmp_path):
        from formula_vad_tpu.apps import train

        rng = np.random.default_rng(0)
        clean = (0.2 * rng.standard_normal((1, 48000))).astype(np.float32)
        noisy = clean + (0.05 * rng.standard_normal((1, 48000))).astype(np.float32)
        write_wav(str(tmp_path / "a.clean.wav"), clean, 48000)
        write_wav(str(tmp_path / "a.noisy.wav"), noisy, 48000)
        out = str(tmp_path / "w.npz")
        assert (
            train.main(
                ["--data", str(tmp_path), "--steps", "2", "--batch", "2",
                 "--frames", "10", "--out", out]
            )
            == 0
        )
        nsnet2.load(out)

    def test_checkpoint_resume(self, tmp_path):
        from formula_vad_tpu.apps import train
        from formula_vad_tpu.utils import checkpoint

        ck = str(tmp_path / "ck")
        out = str(tmp_path / "w.npz")
        args = ["--synthetic", "4", "--steps", "2", "--batch", "2", "--frames", "8",
                "--out", out, "--ckpt-dir", ck, "--ckpt-every", "1"]
        assert train.main(args) == 0
        assert checkpoint.latest_step(ck) == 2
        # resume: steps=4 continues from 2
        args[5] = "4"
        assert train.main(["--synthetic", "4", "--steps", "4", "--batch", "2",
                           "--frames", "8", "--out", out, "--ckpt-dir", ck,
                           "--ckpt-every", "1"]) == 0
        assert checkpoint.latest_step(ck) == 4


class TestDaemonStateResume:
    def test_pipeline_state_round_trip(self, tmp_path):
        params = nsnet2.init_params(jax.random.PRNGKey(1))
        audio = speechy(16, seed=3)

        # continuous run
        pipe_a = AudioPipeline(
            PipelineConfig(vad_config=VADConfig(vad_machine_config=CFG)), params=params
        )
        pipe_a.push_samples(audio)

        # split run with save/load in the middle
        pipe_b1 = AudioPipeline(
            PipelineConfig(vad_config=VADConfig(vad_machine_config=CFG)), params=params
        )
        pipe_b1.push_samples(audio[:, : 8 * 24000])
        state = str(tmp_path / "state.npz")
        pipe_b1.save_state(state)

        pipe_b2 = AudioPipeline(
            PipelineConfig(vad_config=VADConfig(vad_machine_config=CFG)), params=params
        )
        pipe_b2.load_state(state)
        pipe_b2.push_samples(audio[:, 8 * 24000 :])

        assert pipe_a.segments, "test audio must produce a segment"
        assert pipe_b1.segments + pipe_b2.segments == pipe_a.segments

    def test_daemon_state_flag(self, tmp_path):
        from formula_vad_tpu.apps.daemon import Daemon

        audio = speechy(4, seed=4)
        wav_path = str(tmp_path / "seg.wav")
        write_wav(wav_path, audio, 48000)
        state = str(tmp_path / "daemon_state.npz")

        out = io.StringIO()
        d1 = Daemon("T", str(tmp_path), None, stdout=out, state_path=state)
        d1.run(stdin=io.StringIO(json.dumps(
            {"action": "segment", "file_path": wav_path, "playhead_timestamp_ms": 0}
        ) + "\n"))
        assert (tmp_path / "daemon_state.npz").exists()

        d2 = Daemon("T", str(tmp_path), None, stdout=out, state_path=state)
        d2.run(stdin=io.StringIO(json.dumps(
            {"action": "segment", "file_path": wav_path, "playhead_timestamp_ms": 5000}
        ) + "\n"))
        # continuity: second daemon continued sample numbering
        assert d2.pipeline.total_write_count == 2 * audio.shape[1]


class TestSimulatorPreload:
    def test_preload_streaming_equivalence(self, tmp_path, capsys):
        from formula_vad_tpu.apps import simulator

        audio = speechy(16, seed=5)
        write_wav(str(tmp_path / "a.wav"), audio, 48000)
        (tmp_path / "r.txt").write_text("2.0\t4.0\tspeech\n")
        reports = []
        for preload in (False, True):
            plan = {
                "instances": [{"name": "S", "audio_path": "a.wav", "ref_path": "r.txt"}],
                "config": {
                    "batch_streams": False,
                    "preload_audio": preload,
                    "vad_config": {"vad_machine_config": {"long_term_speech_avg_sec": 10.0}},
                },
            }
            p = tmp_path / f"plan{preload}.json"
            p.write_text(json.dumps(plan))
            assert simulator.main(["-i", str(p)]) == 0
            reports.append(capsys.readouterr().out)
        assert reports[0] == reports[1]


def test_resume_matches_uninterrupted_run(tmp_path):
    """Batch draws are seeded per STEP: an interrupted+resumed run must
    produce bit-identical weights to an uninterrupted one (a process-lifetime
    RNG would re-draw the step-0 sequence after resume)."""
    from formula_vad_tpu.apps import train
    from formula_vad_tpu.models import nsnet2

    base = ["--synthetic", "4", "--batch", "2", "--frames", "8"]
    w_straight = str(tmp_path / "straight.npz")
    assert train.main(base + ["--steps", "4", "--out", w_straight]) == 0

    ck = str(tmp_path / "ck")
    w_resumed = str(tmp_path / "resumed.npz")
    assert train.main(base + ["--steps", "2", "--out", w_resumed,
                              "--ckpt-dir", ck, "--ckpt-every", "2"]) == 0
    assert train.main(base + ["--steps", "4", "--out", w_resumed,
                              "--ckpt-dir", ck, "--ckpt-every", "2"]) == 0

    a = nsnet2.load_npz(w_straight)
    b = nsnet2.load_npz(w_resumed)
    import jax
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        assert np.array_equal(np.asarray(la), np.asarray(lb))
