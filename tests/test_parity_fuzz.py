"""Seeded parity fuzz campaign (VERDICT round-1 #4).

The bitwise cross-path identity and the f32-vs-f64 tie-flip argument
(PARITY.md deviation 1) previously rested on a handful of hand-built
cases. This campaign sweeps random VADMachineConfigs x random/marginal
inputs x every compute path against the sequential f64 mirror of the Zig
semantics:

* Part A (N=120): FSM-level fuzz — random dynamic params over 3 ring-shape
  classes, volume sequences engineered to hover AT the open/close
  thresholds (log-normal around threshold_factor x base, ratios straddling
  the ratio threshold), scan_windows vs VADMachineMirror: identical event
  streams and segment boundaries. A mismatch here is a real decision-chain
  divergence, not noise — the fuzz samples ~0.1 relative spread, far above
  the ~1e-7 f32/f64 average divergence.
* Part B (N=24): full-audio fuzz — random dynamic params (one compile per
  path via the fsm_params override), marginal-amplitude bursts, scan ==
  offline == PipelineMirror segments.
* Part C (N=6): slab path at odd stream lengths (non-slab-aligned tails)
  == offline, random configs.
* Part D (N=9): Pallas FSM kernel (interpreter mode on CPU) == scan on the
  Part-A marginal sequences.

All seeds are fixed: a pass is reproducible, and any mismatch that ever
appears must become a PARITY.md deviation or a fix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.pipeline import fsm as jfsm
from formula_vad_tpu.pipeline import offline, vad
from formula_vad_tpu.testing.ref_mirror import PipelineMirror, VADMachineMirror

SR, FFT = 48000, 1024

# Ring-shape classes: (long_sec, init_avg_or_None, short_sec, ratio_sec,
# band). Window counts and band bins are static (compiled once per class);
# everything else is fuzzed dynamically.
SHAPE_CLASSES = [
    (2.0, 0.005, 0.2, 0.5, (500.0, 2000.0)),
    (5.0, None, 0.1, 0.3, (300.0, 3000.0)),
    (0.5, 0.02, 0.5, 1.0, (700.0, 1500.0)),
]


def _class_config(ci: int, rng) -> VADMachineConfig:
    long_sec, init, short_sec, ratio_sec, band = SHAPE_CLASSES[ci]
    return VADMachineConfig(
        long_term_speech_avg_sec=long_sec,
        initial_long_term_avg=init,
        short_term_speech_avg_sec=short_sec,
        channel_vol_ratio_avg_sec=ratio_sec,
        speech_min_freq=band[0],
        speech_max_freq=band[1],
        # dynamic (FSMParams) fields — no recompile:
        speech_threshold_factor=float(rng.uniform(2.0, 20.0)),
        channel_vol_ratio_threshold=float(rng.uniform(0.2, 0.7)),
        min_consecutive_sec_to_open=float(rng.uniform(0.05, 0.5)),
        max_speech_gap_sec=float(rng.uniform(0.3, 2.5)),
        min_vad_duration_sec=float(rng.uniform(0.2, 1.5)),
    )


def _marginal_windows(rng, cfg: VADMachineConfig, n: int):
    """Volume/ratio sequences that live AT the decision boundaries."""
    base = cfg.initial_long_term_avg if cfg.initial_long_term_avg else 0.005
    thresh = base * cfg.speech_threshold_factor
    vols = base * np.exp(0.2 * rng.standard_normal(n))
    ratios = np.clip(
        cfg.channel_vol_ratio_threshold + 0.15 * rng.standard_normal(n), 0.0, 1.0
    )
    # bursts whose volumes hover log-normally around the exact threshold
    # and whose ratios straddle the ratio threshold
    pos = 0
    while pos < n - 10:
        pos += int(rng.integers(5, 40))
        dur = int(rng.integers(3, 60))
        sl = slice(min(pos, n), min(pos + dur, n))
        if sl.stop > sl.start:
            vols[sl] = thresh * np.exp(0.1 * rng.standard_normal(sl.stop - sl.start))
        pos += dur
    return vols.astype(np.float32), ratios.astype(np.float32)


class TestFSMFuzz:
    """Part A + D: the FSM decision chain at the tie boundary."""

    N_PER_CLASS = 40
    N_WINDOWS = 400

    @pytest.mark.parametrize("ci", range(len(SHAPE_CLASSES)))
    def test_scan_matches_mirror_marginal(self, ci):
        long_sec, init, short_sec, ratio_sec, band = SHAPE_CLASSES[ci]
        shape = None
        run = None
        mismatches = []
        for case in range(self.N_PER_CLASS):
            rng = np.random.default_rng(10_000 * ci + case)
            cfg = _class_config(ci, rng)
            new_shape, fp = jfsm.statics_from_config(cfg, SR, FFT)
            if shape is None:
                shape = new_shape
                run = jax.jit(
                    lambda fp, carry, v, r, idx, valid: jfsm.scan_windows(
                        shape, fp, carry, v, r, idx, valid
                    )
                )
            else:
                assert new_shape == shape, "shape class must be compile-stable"
            vols, ratios = _marginal_windows(rng, cfg, self.N_WINDOWS)

            carry = jfsm.init_carry(shape, fp)
            _, outs = run(
                fp, carry,
                jnp.asarray(vols), jnp.asarray(ratios),
                jnp.arange(self.N_WINDOWS, dtype=jnp.int32),
                jnp.ones(self.N_WINDOWS, bool),
            )

            mirror = VADMachineMirror(cfg, SR, FFT)
            for i in range(self.N_WINDOWS):
                mirror.run(i * FFT, np.float32(vols[i]), np.float32(ratios[i]))

            # Part E (round 2): the host-C decoder joins the campaign —
            # int fields must match the scan path bitwise on every case.
            from formula_vad_tpu.pipeline import fsm_host

            if fsm_host.available():
                h = fsm_host.scan_windows_host(
                    shape, fp, vols[None], ratios[None],
                    np.ones((1, self.N_WINDOWS), bool),
                )
                for f in ("event", "event_win", "seg_valid", "seg_start_win",
                          "seg_end_win"):
                    np.testing.assert_array_equal(
                        np.asarray(getattr(h, f)).reshape(-1),
                        np.asarray(getattr(outs, f)).reshape(-1),
                        err_msg=f"host vs scan: {f} (ci={ci}, case={case})",
                    )

            got_events = [
                int(e) for e in np.asarray(outs.event).reshape(-1) if int(e) != 0
            ]
            exp_codes = {"started": 1, "completed": 2, "aborted": 3}
            exp_events = [exp_codes[nm] for nm, _ in mirror.events]
            got_segs = [
                (int(outs.seg_start_win[i]) * FFT, int(outs.seg_end_win[i]) * FFT)
                for i in np.nonzero(np.asarray(outs.seg_valid))[0]
            ]
            margin = cfg.recording_margin_samples(SR)
            got_segs = [(max(0, a - margin), b + margin) for a, b in got_segs]
            exp_segs = [(s["sample_from"], s["sample_to"]) for s in mirror.segments]
            if got_events != exp_events or got_segs != exp_segs:
                mismatches.append((case, cfg, got_events, exp_events, got_segs, exp_segs))
        assert not mismatches, mismatches[:2]

    @pytest.mark.parametrize("ci", range(len(SHAPE_CLASSES)))
    def test_pallas_kernel_matches_scan_marginal(self, ci):
        """Part D: interpreter-mode Pallas FSM == scan on 3 marginal cases
        per shape class (the kernel's identity proof at the tie boundary)."""
        from formula_vad_tpu.pipeline import fsm_pallas

        for case in range(3):
            rng = np.random.default_rng(77_000 + 10_000 * ci + case)
            cfg = _class_config(ci, rng)
            shape, fp = jfsm.statics_from_config(cfg, SR, FFT)
            vols, ratios = _marginal_windows(rng, cfg, 200)
            idx = jnp.arange(200, dtype=jnp.int32)
            valid = jnp.ones(200, bool)

            carry = jfsm.init_carry(shape, fp)
            _, outs = jfsm.scan_windows(
                shape, fp, carry, jnp.asarray(vols), jnp.asarray(ratios), idx, valid
            )
            outs_p = fsm_pallas.scan_windows_pallas(
                shape, fp, jnp.asarray(vols)[None], jnp.asarray(ratios)[None],
                valid[None], interpret=True,
            )
            for field in outs._fields:
                want = np.asarray(getattr(outs, field))
                got = np.asarray(getattr(outs_p, field)).reshape(want.shape)
                if want.dtype.kind == "f":
                    np.testing.assert_allclose(
                        got, want, rtol=1e-6, atol=1e-7,
                        err_msg=f"pallas vs scan: {field} (ci={ci}, case={case})",
                    )
                else:
                    np.testing.assert_array_equal(
                        got, want,
                        err_msg=f"pallas vs scan: {field} (ci={ci}, case={case})",
                    )


def _marginal_audio(rng, cfg: VADMachineConfig, n_chunks: int) -> np.ndarray:
    """Stereo audio whose burst band-volumes land near the open threshold."""
    t_total = n_chunks * 24000
    t = np.arange(t_total) / SR
    audio = (0.004 * rng.standard_normal((2, t_total))).astype(np.float32)
    n_bursts = int(rng.integers(2, 6))
    for _ in range(n_bursts):
        a = rng.uniform(0.0, max(0.1, t_total / SR - 1.5))
        d = rng.uniform(0.2, 2.0)
        sl = slice(int(a * SR), int((a + d) * SR))
        f = rng.uniform(cfg.speech_min_freq, cfg.speech_max_freq)
        # spread amplitudes across weak/marginal/strong so some bursts sit
        # at the decision edge rather than far above it
        amp = float(rng.choice([0.01, 0.02, 0.04, 0.1, 0.3]))
        burst = (amp * np.sin(2 * np.pi * f * t[sl])).astype(np.float32)
        audio[0, sl] += burst
        audio[1, sl] += rng.uniform(0.4, 1.0) * burst
    return audio


@pytest.fixture(scope="module")
def params():
    return nsnet2.init_params(jax.random.PRNGKey(21))


class TestFullPathFuzz:
    """Part B: scan == offline == f64 mirror on marginal audio, one compile
    per path (dynamic fsm_params), 24 random configs."""

    N_CASES = 24
    N_CHUNKS = 6

    def test_scan_offline_mirror(self, params):
        ci = 0  # fixed shape class -> one compile per path
        st0 = vad.statics_from_config(
            VADConfig(vad_machine_config=_class_config(ci, np.random.default_rng(0)))
        )
        run_scan = jax.jit(
            lambda a, fp: vad.process_stream(params, st0, a, fsm_params=fp)
        )
        run_off = jax.jit(
            lambda a, fp: offline.process_stream_offline(params, st0, a, fsm_params=fp)
        )
        mismatches = []
        for case in range(self.N_CASES):
            rng = np.random.default_rng(500_000 + case)
            cfg = _class_config(ci, rng)
            st = vad.statics_from_config(VADConfig(vad_machine_config=cfg))
            assert st.fsm_shape == st0.fsm_shape
            audio = _marginal_audio(rng, cfg, self.N_CHUNKS)

            _, outs = run_scan(jnp.asarray(audio), st.fsm_params)
            scan_segs = vad.segments_from_outputs(st, outs)
            win_out, valid, _ = run_off(jnp.asarray(audio), st.fsm_params)
            off_segs = offline.segments_from_offline(st, win_out)
            mirror_segs = PipelineMirror(params, cfg).run(audio)
            mirror_bounds = [
                (s["sample_from"], s["sample_to"]) for s in mirror_segs
            ]
            scan_bounds = [(s["sample_from"], s["sample_to"]) for s in scan_segs]
            off_bounds = [(s["sample_from"], s["sample_to"]) for s in off_segs]
            if not (scan_bounds == off_bounds == mirror_bounds):
                mismatches.append((case, cfg, scan_bounds, off_bounds, mirror_bounds))
        assert not mismatches, mismatches[:2]


class TestSlabFuzz:
    """Part C: slab path at odd (non-slab-aligned) lengths == offline."""

    def test_slab_odd_lengths(self, params):
        from formula_vad_tpu.parallel.slab_runner import SLAB_ALIGN_CHUNKS, SlabRunner

        rng = np.random.default_rng(900_001)
        cfg = _class_config(0, rng)
        vc = VADConfig(vad_machine_config=cfg)
        st = vad.statics_from_config(vc)
        chunk = st.chunk_size
        slab_chunks = SLAB_ALIGN_CHUNKS * 2
        runner = SlabRunner(
            params, vc, slab_chunks=slab_chunks, use_mesh=False, use_pallas_fsm=False
        )

        # 6 streams, every length deliberately off the slab boundary
        # (including sub-chunk tails the device path must ignore).
        lengths = [
            slab_chunks * chunk - 1,
            slab_chunks * chunk + 1,
            (slab_chunks + 3) * chunk + 12345,
            (2 * slab_chunks - 1) * chunk,
            chunk + 7,
            3 * chunk,
        ]
        max_t = max(lengths)
        pad_t = ((max_t + chunk - 1) // chunk) * chunk
        batch = np.zeros((len(lengths), 2, pad_t), np.float32)
        for i, ln in enumerate(lengths):
            a = _marginal_audio(rng, cfg, (ln + chunk - 1) // chunk)
            batch[i, :, :ln] = a[:, :ln]

        results = runner.run(batch, lengths)

        run_off = jax.jit(
            lambda a, nv: offline.process_stream_offline(
                params, st, a, n_valid_chunks=nv
            )
        )
        for i, ln in enumerate(lengths):
            n_chunks = ln // chunk
            win_out, valid, _ = run_off(
                jnp.asarray(batch[i]), jnp.asarray(n_chunks, jnp.int32)
            )
            off_segs = offline.segments_from_offline(st, win_out)
            got = [(s["sample_from"], s["sample_to"]) for s in results[i].segments]
            want = [(s["sample_from"], s["sample_to"]) for s in off_segs]
            assert got == want, (i, ln, got, want)
