"""Cross-path identity check on the CURRENT platform (run it on the real
chip; the CPU test suite asserts the same on the virtual mesh).

Asserts that the streaming scan, the chunk-parallel offline path, the slab
runner, and the Pallas FSM kernel produce IDENTICAL segment boundaries and
durations (and that the FSM kernel's window outputs are bit-identical to
the lax.scan FSM given the same inputs) on random multi-burst audio. This
is the framework's core parity invariant (PARITY.md); reduction orders
differ between backends in principle, so the claim deserves a one-command
re-check on real hardware after any change to the compute path.

One documented exception (PARITY.md "controlled deviations"): the
``avg_channel_vol_ratio`` diagnostic is compared at 1e-5 rather than
bitwise — on TPU, XLA's reduction tree for the per-chunk RMS differs
between the scan context (one chunk per step) and the batched offline
context (vmap over all chunks), giving ~1-ulp differences in the ratio
values. Boundaries, events, and vad_met_sec must still match exactly.

    python benchmarks/chip_identity_check.py              # real TPU
    FVAD_CHECK_CPU=1 python benchmarks/chip_identity_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup  # noqa: E402

bench_setup()

import jax
import jax.numpy as jnp
import numpy as np

from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.pipeline import fsm, fsm_pallas, offline, vad


def speechy(n_chunks, bursts, seed):
    rng = np.random.default_rng(seed)
    t_total = n_chunks * 24000
    t = np.arange(t_total) / 48000.0
    base = 0.003 * rng.standard_normal((2, t_total))
    env = np.zeros(t_total)
    for s, d in bursts:
        env[int(s * 48000) : int((s + d) * 48000)] = 1.0
    sp = (0.25 * np.sin(2 * np.pi * 700 * t) + 0.15 * np.sin(2 * np.pi * 1300 * t)) * env
    return (base + np.stack([sp, 0.9 * sp])).astype(np.float32)


def segs_equal(a: list[dict], b: list[dict]) -> bool:
    """Exact on boundaries/durations; 1e-5 relative on the ratio diagnostic."""
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if (x["sample_from"], x["sample_to"], x["vad_met_sec"]) != (
            y["sample_from"], y["sample_to"], y["vad_met_sec"]
        ):
            return False
        r1, r2 = x["avg_channel_vol_ratio"], y["avg_channel_vol_ratio"]
        if abs(r1 - r2) > 1e-5 * max(1.0, abs(r1)):
            return False
    return True


def main() -> int:
    # The container's sitecustomize pins JAX_PLATFORMS=axon before user code
    # runs; honor an explicit cpu request through jax.config like conftest.
    if os.environ.get("FVAD_CHECK_CPU"):
        jax.config.update("jax_platforms", "cpu")
    print(f"platform: {jax.devices()[0].platform}")
    params = nsnet2.load(None)
    cfg = VADConfig(vad_machine_config=VADMachineConfig(long_term_speech_avg_sec=10.0))
    st = vad.statics_from_config(cfg)
    on_tpu = jax.devices()[0].platform != "cpu"

    failures = 0
    total_segments = 0
    # Cases 0-3: short 8 s streams across seeds. Case 4: a production-length
    # 80 s stream — catches any batch-size- or length-dependent numerics in
    # the front-end (e.g. a GRU schedule that varied with the flattened
    # batch would show up here as a scan-vs-offline boundary mismatch).
    cases = [(seed, 16) for seed in range(4)] + [(4, 160)]
    limit = int(os.environ.get("FVAD_CHECK_CASES", "0"))
    if limit:  # smoke subset (e.g. CPU queue rehearsal)
        cases = cases[:limit]
    for seed, n_chunks in cases:
        rng = np.random.default_rng(100 + seed)
        span = n_chunks * 0.5
        bursts = [
            (float(rng.uniform(1, 3)), float(rng.uniform(1, 2.5))),
            (float(rng.uniform(0.7 * span, 0.7 * span + 2)), float(rng.uniform(1, 2.5))),
        ]
        audio = speechy(n_chunks, bursts, seed)

        # 1) streaming scan
        _, outs = jax.jit(lambda a: vad.process_stream(params, st, a))(jnp.asarray(audio))
        seg_scan = vad.segments_from_outputs(st, outs)

        # 2) offline chunk-parallel (lax.scan FSM)
        win_out, _, _ = jax.jit(
            lambda a: offline.process_stream_offline(params, st, a)
        )(jnp.asarray(audio))
        seg_off = offline.segments_from_offline(st, win_out)

        # 3) offline batched with the Pallas FSM kernel (TPU only)
        seg_pallas = None
        if on_tpu:
            wo_b, _ = jax.jit(
                lambda a: offline.process_batch_offline(params, st, a, use_pallas_fsm=True)
            )(jnp.asarray(audio)[None])
            seg_pallas = offline.segments_from_offline(
                st, jax.tree_util.tree_map(lambda x: x[0], wo_b)
            )
            # bit-level window outputs: pallas vs scan FSM on the same inputs
            min_vol, ratios, valid = offline.window_inputs(
                params, st, jnp.asarray(audio), jnp.int32(n_chunks)
            )
            carry = fsm.init_carry(st.fsm_shape, st.fsm_params)
            _, ref_out = fsm.scan_windows(
                st.fsm_shape, st.fsm_params, carry, min_vol, ratios,
                jnp.arange(min_vol.shape[0], dtype=jnp.int32), valid,
            )
            k_out = fsm_pallas.scan_windows_pallas(
                st.fsm_shape, st.fsm_params, min_vol[None], ratios[None], valid[None]
            )
            for f in ref_out._fields:
                a, b = np.asarray(getattr(ref_out, f)), np.asarray(getattr(k_out, f))[0]
                if not np.array_equal(a, b):
                    print(f"seed {seed}: FSM field {f} differs (pallas vs scan)")
                    failures += 1

            # host-C decoder on the same chip-produced inputs: int fields
            # bitwise vs the hardware kernel; float fields allclose — the
            # TPU lowers f32 divide as multiply-by-reciprocal while the
            # host divides IEEE-correctly, so seg_ratio/averages carry
            # ~1-ulp differences on real silicon (bitwise on the
            # interpreter; PARITY.md dev. 10).
            from formula_vad_tpu.pipeline import fsm_host

            if fsm_host.available():
                h_out = fsm_host.scan_windows_host(
                    st.fsm_shape, st.fsm_params,
                    np.asarray(min_vol)[None], np.asarray(ratios)[None],
                    np.asarray(valid)[None],
                )
                for f in ref_out._fields:
                    a = np.asarray(getattr(k_out, f))[0]
                    b = np.asarray(getattr(h_out, f)).reshape(a.shape)
                    if a.dtype.kind == "f":
                        if not np.allclose(b, a, rtol=1e-6, atol=1e-7):
                            d = float(np.max(np.abs(b - a)))
                            print(
                                f"seed {seed}: FSM field {f} differs "
                                f"(host vs pallas, max abs {d:.3e})"
                            )
                            failures += 1
                    elif not np.array_equal(a, b):
                        print(f"seed {seed}: FSM field {f} differs (host vs pallas)")
                        failures += 1

        # 4) slab runner
        from formula_vad_tpu.parallel.slab_runner import SlabRunner

        sr = SlabRunner(params, cfg, n_channels=2, slab_chunks=32)
        seg_slab = sr.run(audio[None], [audio.shape[1]])[0].segments

        # 5) slab runner fed raw int16 PCM with on-device dequant: must be
        # bit-identical to host-decoded f32 of the same quantized samples.
        q = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)
        dec = q.astype(np.float32) / 32768.0
        sr16a = SlabRunner(params, cfg, n_channels=2, slab_chunks=32)
        seg_16f = sr16a.run_readers(
            [lambda s, n: dec[:, s : s + n]], [audio.shape[1]]
        )[0].segments
        sr16b = SlabRunner(params, cfg, n_channels=2, slab_chunks=32)
        seg_16r = sr16b.run_readers(
            [lambda s, n: q[:, s : s + n]], [audio.shape[1]], raw16=True
        )[0].segments
        if not segs_equal(seg_16f, seg_16r):
            print(f"seed {seed}: raw16 slab path differs from f32 decode")
            failures += 1

        ok = segs_equal(seg_scan, seg_off) and segs_equal(seg_scan, seg_slab)
        if seg_pallas is not None:
            ok = ok and segs_equal(seg_scan, seg_pallas)
        status = "OK " if ok else "FAIL"
        if not ok:
            failures += 1
        total_segments += len(seg_scan)
        print(f"seed {seed}: {status} scan={len(seg_scan)} off={len(seg_off)} "
              f"slab={len(seg_slab)}"
              + (f" pallas={len(seg_pallas)}" if seg_pallas is not None else ""))

    if total_segments == 0:
        print("FAIL: no seed produced any segment — inputs too weak to exercise paths")
        failures += 1
    print("IDENTITY OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
