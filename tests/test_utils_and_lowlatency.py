"""Tests for the aux subsystems (logging, checkpoint, profiling, uuid) and
the low-latency streaming denoiser."""

import logging as py_logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.pipeline import lowlatency, vad
from formula_vad_tpu.utils import checkpoint, logging as fvad_logging, profiling, uuid as fvad_uuid


@pytest.fixture(scope="module")
def params():
    return nsnet2.init_params(jax.random.PRNGKey(3))


class TestLowLatency:
    def test_chunked_equals_oneshot(self, params):
        """hop-by-hop step() chain == one lax.scan run()."""
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal((2, 20 * 480))).astype(np.float32)
        _, full = jax.jit(lambda a: lowlatency.run(params, a))(jnp.asarray(audio))

        state = lowlatency.init_state((2,))
        outs = []
        sfn = jax.jit(lambda s, h: lowlatency.step(params, s, h))
        for i in range(20):
            state, out = sfn(state, jnp.asarray(audio[:, i * 480 : (i + 1) * 480]))
            outs.append(np.asarray(out))
        np.testing.assert_allclose(
            np.concatenate(outs, axis=-1), np.asarray(full), atol=1e-5
        )

    def test_latency_is_one_hop(self, params):
        """An impulse at hop k appears in output hops k and k+1 only (10 ms
        algorithmic latency + OLA tail), not 0.5 s like the batch mode."""
        audio = np.zeros((1, 10 * 480), np.float32)
        # offset must be a multiple of the decimation rate or the naive
        # downsampler (reference semantics) drops the impulse entirely
        audio[0, 5 * 480 + 99] = 1.0
        _, out = lowlatency.run(params, jnp.asarray(audio))
        energy = np.abs(np.asarray(out)).reshape(10, 480).sum(axis=-1) > 1e-6
        assert not energy[:5].any()
        assert energy[5] or energy[6]


class TestCheckpoint:
    def test_carry_round_trip(self, tmp_path, params):
        st = vad.statics_from_config(VADConfig())
        carry = vad.init_carry(st)
        # mutate via one chunk so the carry is nontrivial
        rng = np.random.default_rng(1)
        chunk = jnp.asarray(0.05 * rng.standard_normal((2, 24000)), jnp.float32)
        carry, _ = vad.chunk_step(params, st, carry, chunk)

        path = str(tmp_path / "carry.npz")
        checkpoint.save_carry(path, carry)
        restored = checkpoint.load_carry(path, vad.init_carry(st))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            carry,
            restored,
        )

    def test_resume_continues_identically(self, tmp_path, params):
        """Process 4 chunks; checkpoint after 2; resume must match."""
        st = vad.statics_from_config(VADConfig(vad_machine_config=VADMachineConfig(long_term_speech_avg_sec=5.0)))
        rng = np.random.default_rng(2)
        audio = (0.05 * rng.standard_normal((2, 4 * 24000))).astype(np.float32)
        step = jax.jit(lambda c, a: vad.chunk_step(params, st, c, a))

        carry = vad.init_carry(st)
        for k in range(2):
            carry, _ = step(carry, jnp.asarray(audio[:, k * 24000 : (k + 1) * 24000]))
        path = str(tmp_path / "mid.npz")
        checkpoint.save_carry(path, carry)

        outs_a = []
        ca = carry
        for k in range(2, 4):
            ca, o = step(ca, jnp.asarray(audio[:, k * 24000 : (k + 1) * 24000]))
            outs_a.append(o)

        cb = checkpoint.load_carry(path, vad.init_carry(st))
        outs_b = []
        for k in range(2, 4):
            cb, o = step(cb, jnp.asarray(audio[:, k * 24000 : (k + 1) * 24000]))
            outs_b.append(o)

        for a, b in zip(outs_a, outs_b):
            jax.tree_util.tree_map(
                lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
                a, b,
            )

    def test_shape_mismatch_rejected(self, tmp_path):
        path = str(tmp_path / "bad.npz")
        checkpoint.save_carry(path, {"a": jnp.zeros(3)})
        with pytest.raises(ValueError):
            checkpoint.load_carry(path, {"a": jnp.zeros(4)})

    def test_train_state_npz_round_trip(self, tmp_path, params):
        import optax

        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        checkpoint.save_train_state(str(tmp_path), params, opt_state, step=7)
        assert checkpoint.latest_step(str(tmp_path)) == 7
        p2, o2 = checkpoint.load_train_state(str(tmp_path), params, opt_state, 7)
        np.testing.assert_array_equal(np.asarray(p2.fc_in_w), np.asarray(params.fc_in_w))


class TestAux:
    def test_logging_scopes(self):
        fvad_logging.configure(scope_levels=fvad_logging.SIMULATOR_SCOPE_LEVELS)
        assert fvad_logging.scoped("vad_sm").level == py_logging.WARNING
        assert set(fvad_logging.SCOPES) >= {"vad", "vad_sm", "pipeline", "simulator"}

    def test_profiler_spans(self):
        p = profiling.Profiler()
        with p.span("stage_a"):
            pass
        with p.span("stage_a"):
            pass
        assert p.counts["stage_a"] == 2
        assert "stage_a" in p.report()
        assert profiling.realtime_factor(100.0, 0.01) == pytest.approx(10000.0)

    def test_uuid(self):
        u = fvad_uuid.new_v4()
        assert fvad_uuid.format(fvad_uuid.parse(u)) == u
        with pytest.raises(ValueError):
            fvad_uuid.parse("not-a-uuid")

    def test_uuid_reference_vectors(self):
        """The reference's own parse/format vectors (uuid.zig:133-159)."""
        valid = [
            "d0cd8041-0504-40cb-ac8e-d05960d205ec",
            "3df6f0e4-f9b1-4e34-ad70-33206069b995",
            "f982cf56-c4ab-4229-b23c-d17377d000be",
            "6b9f53be-cf46-40e8-8627-6b60dc33def8",
            "c282ec76-ac18-4d4a-8a29-3b94f5c74813",
            "00000000-0000-0000-0000-000000000000",
        ]
        for text in valid:
            assert fvad_uuid.format(fvad_uuid.parse(text)) == text
        invalid = [
            "3df6f0e4-f9b1-4e34-ad70-33206069b99",  # too short
            "3df6f0e4-f9b1-4e34-ad70-33206069b9912",  # too long
            "3df6f0e4-f9b1-4e34-ad70_33206069b9912",  # bad separator
            "zdf6f0e4-f9b1-4e34-ad70-33206069b995",  # invalid character
            # stdlib uuid.UUID would ACCEPT these lenient forms; the
            # reference's strict parser must not:
            "{d0cd8041-0504-40cb-ac8e-d05960d205ec}",
            "d0cd8041050440cbac8ed05960d205ec0000",
        ]
        for text in invalid:
            with pytest.raises(fvad_uuid.InvalidUUID):
                fvad_uuid.parse(text)
        assert fvad_uuid.format(fvad_uuid.zero) == "0" * 8 + "-0000" * 3 + "-" + "0" * 12
