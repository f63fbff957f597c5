"""Host-C FSM decoder (pipeline/fsm_host.py + native/fvadfsm.cpp) parity.

The host decoder must replicate ``fsm.step_window`` exactly: all integer
outputs bitwise, all float outputs bitwise (they are sequential f32 folds
in both paths), with met-bit agreement resting on the same Kahan-vs-sum
ulp argument as the Pallas kernel (PARITY.md deviation 9's class).  The
marginal fuzz inputs here are the same generator as test_parity_fuzz
(volumes hovering AT the decision thresholds).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from formula_vad_tpu.pipeline import fsm as jfsm
from formula_vad_tpu.pipeline import fsm_host

from test_parity_fuzz import SHAPE_CLASSES, SR, FFT, _class_config, _marginal_windows

pytestmark = pytest.mark.skipif(
    not fsm_host.available(), reason="native FSM decoder unavailable"
)


def _scan(shape, fp, vols, ratios, valid, win_idx=None, carry=None):
    if carry is None:
        carry = jfsm.init_carry(shape, fp)
    n = len(vols)
    if win_idx is None:
        win_idx = jnp.arange(n, dtype=jnp.int32)
    return jfsm.scan_windows(
        shape, fp, carry, jnp.asarray(vols), jnp.asarray(ratios), win_idx,
        jnp.asarray(valid),
    )


def _assert_outputs_equal(want, got, ctx=""):
    """Int fields bitwise; float fields allclose — the scan path's float
    outputs carry XLA-fusion rounding (same standard as test_parity_fuzz
    Part D).  Host-vs-Pallas IS bitwise (test_pallas_interpret_bitwise)."""
    for f in want._fields:
        w = np.asarray(getattr(want, f))
        g = np.asarray(getattr(got, f)).reshape(w.shape)
        if w.dtype.kind == "f":
            np.testing.assert_allclose(
                g, w, rtol=1e-6, atol=1e-7, err_msg=f"host vs scan: {f} {ctx}"
            )
        else:
            np.testing.assert_array_equal(g, w, err_msg=f"host vs scan: {f} {ctx}")


class TestHostVsScan:
    @pytest.mark.parametrize("ci", range(len(SHAPE_CLASSES)))
    def test_marginal_fuzz(self, ci):
        """Bitwise WindowOutput identity on threshold-hovering inputs."""
        n = 400
        for case in range(8):
            rng = np.random.default_rng(10_000 * ci + case)
            cfg = _class_config(ci, rng)
            shape, fp = jfsm.statics_from_config(cfg, SR, FFT)
            vols, ratios = _marginal_windows(rng, cfg, n)
            valid = np.ones(n, bool)
            _, outs = _scan(shape, fp, vols, ratios, valid)
            got = fsm_host.scan_windows_host(
                shape, fp, vols[None], ratios[None], valid[None]
            )
            _assert_outputs_equal(outs, got, f"(ci={ci}, case={case})")

    def test_invalid_windows_freeze(self):
        """Padding windows freeze the carry and emit inert outputs."""
        rng = np.random.default_rng(7)
        cfg = _class_config(0, rng)
        shape, fp = jfsm.statics_from_config(cfg, SR, FFT)
        vols, ratios = _marginal_windows(rng, cfg, 300)
        valid = np.ones(300, bool)
        valid[120:150] = False
        valid[280:] = False
        _, outs = _scan(shape, fp, vols, ratios, valid)
        got = fsm_host.scan_windows_host(
            shape, fp, vols[None], ratios[None], valid[None]
        )
        _assert_outputs_equal(outs, got)

    def test_batch_and_per_stream_params(self):
        """[B] param vectors: each row == its own solo scan."""
        b, n = 5, 300
        rows = []
        shapes = None
        for i in range(b):
            rng = np.random.default_rng(40_000 + i)
            cfg = _class_config(1, rng)
            shape, fp = jfsm.statics_from_config(cfg, SR, FFT)
            shapes = shape
            vols, ratios = _marginal_windows(rng, cfg, n)
            rows.append((fp, vols, ratios))
        fp_b = jfsm.FSMParams(
            *[np.stack([np.asarray(r[0][k]) for r in rows]) for k in range(6)]
        )
        mv = np.stack([r[1] for r in rows])
        vr = np.stack([r[2] for r in rows])
        valid = np.ones((b, n), bool)
        got = fsm_host.scan_windows_host(shapes, fp_b, mv, vr, valid)
        for i, (fp, vols, ratios) in enumerate(rows):
            _, outs = _scan(shapes, fp, vols, ratios, valid[i])
            one = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], got)
            _assert_outputs_equal(outs, one, f"(row {i})")

    def test_chaining_bitwise(self):
        """Split-call chaining == one-shot, outputs AND carry bitwise."""
        rng = np.random.default_rng(99)
        cfg = _class_config(2, rng)
        shape, fp = jfsm.statics_from_config(cfg, SR, FFT)
        n = 500
        vols, ratios = _marginal_windows(rng, cfg, n)
        valid = np.ones((1, n), bool)

        full, c_full = fsm_host.scan_windows_host(
            shape, fp, vols[None], ratios[None], valid, return_carry=True
        )
        cut = 217
        a, c1 = fsm_host.scan_windows_host(
            shape, fp, vols[None, :cut], ratios[None, :cut], valid[:, :cut],
            return_carry=True,
        )
        b_out, c2 = fsm_host.scan_windows_host(
            shape, fp, vols[None, cut:], ratios[None, cut:], valid[:, cut:],
            carry=c1, win_base=np.asarray([cut], np.int32), return_carry=True,
        )
        for f in full._fields:
            w = np.asarray(getattr(full, f))
            g = np.concatenate(
                [np.asarray(getattr(a, f)), np.asarray(getattr(b_out, f))], axis=1
            )
            np.testing.assert_array_equal(g, w, err_msg=f"chained: {f}")
        for k in c_full:
            np.testing.assert_array_equal(
                np.asarray(c2[k]), np.asarray(c_full[k]), err_msg=f"carry: {k}"
            )

    def test_carry_conversion_from_device(self):
        """A scan-path prefix carry converted via host_carry continues to
        the same segments as the full scan run (met-bit agreement across
        the Kahan-vs-jnp.sum seam; non-tie inputs)."""
        rng = np.random.default_rng(123)
        cfg = _class_config(0, rng)
        shape, fp = jfsm.statics_from_config(cfg, SR, FFT)
        n, cut = 400, 160
        vols, ratios = _marginal_windows(rng, cfg, n)
        valid = jnp.ones(n, bool)

        carry0 = jfsm.init_carry(shape, fp)
        c_mid, outs_a = jfsm.scan_windows(
            shape, fp, carry0, jnp.asarray(vols[:cut]), jnp.asarray(ratios[:cut]),
            jnp.arange(cut, dtype=jnp.int32), valid[:cut],
        )
        _, outs_full = _scan(shape, fp, vols, ratios, np.ones(n, bool))

        dev_carry = jax.tree_util.tree_map(lambda x: np.asarray(x)[None], c_mid)
        got_b = fsm_host.scan_windows_host(
            shape, fp, vols[None, cut:], ratios[None, cut:],
            np.ones((1, n - cut), bool), carry=dev_carry,
            win_base=np.asarray([cut], np.int32),
        )
        want_ev = np.asarray(outs_full.event)[cut:]
        np.testing.assert_array_equal(np.asarray(got_b.event).reshape(-1), want_ev)
        want_sv = np.asarray(outs_full.seg_valid)[cut:]
        np.testing.assert_array_equal(
            np.asarray(got_b.seg_valid).reshape(-1), want_sv
        )

    def test_pallas_interpret_bitwise(self):
        """Host decoder == Pallas kernel (interpreter mode), all fields."""
        from formula_vad_tpu.pipeline import fsm_pallas

        rng = np.random.default_rng(555)
        cfg = _class_config(1, rng)
        shape, fp = jfsm.statics_from_config(cfg, SR, FFT)
        n = 200
        vols, ratios = _marginal_windows(rng, cfg, n)
        valid = jnp.ones((1, n), bool)
        outs_p = fsm_pallas.scan_windows_pallas(
            shape, fp, jnp.asarray(vols)[None], jnp.asarray(ratios)[None],
            valid, interpret=True,
        )
        got = fsm_host.scan_windows_host(
            shape, fp, vols[None], ratios[None], np.ones((1, n), bool)
        )
        for f in outs_p._fields:
            # ALL fields bitwise, floats included: both paths run the same
            # sequential f32 folds in the same order.
            w = np.asarray(getattr(outs_p, f))
            g = np.asarray(getattr(got, f)).reshape(w.shape)
            np.testing.assert_array_equal(g, w, err_msg=f"host vs pallas: {f}")


class TestHostFsmRunners:
    """The host-FSM default in BatchRunner/SlabRunner matches the device
    paths segment-for-segment (including alt-config machines)."""

    def _corpus(self, b=3, n_chunks=4):
        rng = np.random.default_rng(31_337)
        cfg = _class_config(0, rng)
        from formula_vad_tpu.config import VADConfig

        vc = VADConfig(
            vad_machine_config=cfg,
            alt_vad_machine_configs=[
                _class_config(0, np.random.default_rng(5)),
                _class_config(0, np.random.default_rng(6)),
            ],
        )
        from test_parity_fuzz import _marginal_audio

        audio = np.stack(
            [_marginal_audio(np.random.default_rng(200 + i), cfg, n_chunks)
             for i in range(b)]
        )
        lengths = [audio.shape[-1], audio.shape[-1] - 30_000, audio.shape[-1]]
        return vc, audio, lengths

    def test_batch_runner_host_matches_scan(self):
        from formula_vad_tpu.models import nsnet2
        from formula_vad_tpu.parallel.runner import BatchRunner

        params = nsnet2.init_params(jax.random.PRNGKey(21))
        vc, audio, lengths = self._corpus()
        host = BatchRunner(params, vc, use_mesh=False, use_host_fsm=True)
        dev = BatchRunner(params, vc, use_mesh=False, use_host_fsm=False)
        got = host.run(audio, lengths)
        want = dev.run(audio, lengths)
        for g, w in zip(got, want):
            assert g.segments == w.segments
            assert g.alt_segments == w.alt_segments

    def test_slab_runner_host_matches_device(self):
        from formula_vad_tpu.models import nsnet2
        from formula_vad_tpu.parallel.slab_runner import (
            SLAB_ALIGN_CHUNKS, SlabRunner,
        )

        params = nsnet2.init_params(jax.random.PRNGKey(21))
        vc, audio, lengths = self._corpus(b=3, n_chunks=2 * SLAB_ALIGN_CHUNKS + 5)
        kw = dict(slab_chunks=SLAB_ALIGN_CHUNKS, use_mesh=False)
        host = SlabRunner(params, vc, use_host_fsm=True, **kw)
        dev = SlabRunner(params, vc, use_host_fsm=False, use_pallas_fsm=False, **kw)
        got = host.run(audio, lengths)
        want = dev.run(audio, lengths)
        for g, w in zip(got, want):
            assert g.segments == w.segments
            assert g.alt_segments == w.alt_segments


class TestHostValidation:
    """The wrapper must refuse malformed inputs before handing raw
    pointers to C (self-review hardening)."""

    def _setup(self):
        rng = np.random.default_rng(1)
        cfg = _class_config(0, rng)
        shape, fp = jfsm.statics_from_config(cfg, SR, FFT)
        mv = rng.uniform(0, 0.1, (3, 50)).astype(np.float32)
        return shape, fp, mv

    def test_untiled_alt_params_raise(self):
        shape, fp, mv = self._setup()
        bad = jfsm.FSMParams(*[np.asarray([v, v]) for v in fp])  # [K=2] != B=3
        with pytest.raises(ValueError, match="tile_param_rows"):
            fsm_host.scan_windows_host(shape, bad, mv, mv, np.ones_like(mv, bool))

    def test_mismatched_ring_raises(self):
        shape, fp, mv = self._setup()
        carry = fsm_host.init_host_carry(shape, fp, 3)
        carry["long_buf"] = np.zeros((3, shape.long_window + 7), np.float32)
        with pytest.raises(ValueError, match="long_buf"):
            fsm_host.scan_windows_host(
                shape, fp, mv, mv, np.ones_like(mv, bool), carry=carry
            )

    def test_mismatched_inputs_raise(self):
        shape, fp, mv = self._setup()
        with pytest.raises(ValueError, match="valids"):
            fsm_host.scan_windows_host(shape, fp, mv, mv, np.ones((3, 49), bool))

    def test_out_of_range_cursor_raises(self):
        shape, fp, mv = self._setup()
        carry = fsm_host.init_host_carry(shape, fp, 3)
        carry["short_idx"] = np.full((3,), shape.short_window, np.int32)
        with pytest.raises(ValueError, match="short_idx"):
            fsm_host.scan_windows_host(
                shape, fp, mv, mv, np.ones_like(mv, bool), carry=carry
            )
