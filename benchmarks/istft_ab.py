"""A/B: lane-padded iSTFT inverse basis (FVAD_ISTFT_PAD) vs the plain form.

`tail_layout_exp.py` (2026-08-19, on chip) measured the BARE op: explicit
K+N zero-padding of the [322, 320] inverse basis to [384, 384] wins 8/9
reps and removes the op's 1.0-3.2 ms run-to-run tiling spread (ROOFLINE's
unexplained istft variance), gate max|d| = 0.0 at all three modes. This
decides the FULL-STEP question: does the padded program also win (or at
least never lose) inside `offline.window_inputs_batch` — the exact device
step bench.py times on the host-FSM path — where XLA may fuse the istft
differently in context?

Interleaved in ONE process (relay throttle lottery — verify SKILL.md),
slope-timed with a real device-reduction sync, bitwise gates alongside
(the contract IS bitwise: zero K rows occupy the same tile positions as
XLA's implicit pad, zero N cols are sliced off).

Run on the real chip (cwd=/root/repo):  python benchmarks/istft_ab.py
Modes: BENCH_MODES=all for highest+bf16+bf16_io; default bf16_io only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup, slope_from_run  # noqa: E402

bench_setup()

import jax
import jax.numpy as jnp

from formula_vad_tpu.config import VADConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import precision, stft
from formula_vad_tpu.pipeline import offline, vad

N_STREAMS = int(os.environ.get("BENCH_STREAMS", "21"))
N_CHUNKS = int(os.environ.get("BENCH_CHUNKS", "40"))
N_ITERS = int(os.environ.get("AB_ITERS", "12"))
REPS = 3


def make_step_fn(params, st, pad: bool):
    # Fresh closure per variant AND per mode (trace-cache rule); the pad
    # toggle is read at TRACE time, so pin it around every call.
    jfe = jax.jit(lambda a: offline.window_inputs_batch(params, st, a))

    def call(audio):
        stft.set_istft_pad(pad)
        try:
            return jfe(audio)
        finally:
            stft.set_istft_pad(None)

    return call


def slope_time(fn, audios, n_long, probe):
    out = fn(audios[0])
    float(probe(out))  # compile + true sync

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(audios[i % len(audios)])
        float(probe(out))
        return time.perf_counter() - t0

    return slope_from_run(run, n_long)


def main():
    params = nsnet2.load(None)
    st = vad.statics_from_config(VADConfig())
    audio_sec = N_STREAMS * N_CHUNKS * st.chunk_size / st.sample_rate

    mode_list = [("bf16_io", "default", "bf16")]
    if os.environ.get("BENCH_MODES") == "all":
        mode_list = [
            ("highest", "highest", "f32"),
            ("bf16", "default", "f32"),
            ("bf16_io", "default", "bf16"),
        ]
    # Inputs generated on device: only PRNG keys cross the tunnel.
    gen = jax.jit(
        lambda key: 0.02
        * jax.random.normal(
            key, (N_STREAMS, st.n_channels, N_CHUNKS * st.chunk_size), jnp.float32
        )
    )
    audios = [gen(jax.random.PRNGKey(i)) for i in range(2)]

    for mode_name, level, io in mode_list:
        precision.set_matmul_precision(level)
        precision.set_io_dtype(io)

        sf, sp = make_step_fn(params, st, False), make_step_fn(params, st, True)
        b_mv, b_rt, b_va = sf(audios[0])
        g_mv, g_rt, g_va = sp(audios[0])
        step_gate = bool(
            jnp.all(b_mv == g_mv) & jnp.all(b_rt == g_rt) & jnp.all(b_va == g_va)
        )
        mv_dev = float(jnp.max(jnp.abs(b_mv - g_mv)))
        print(
            f"== mode={mode_name} ==  step bitwise: {step_gate}  "
            f"(max |d mv| = {mv_dev:.3e})",
            flush=True,
        )

        fns = {
            "step_plain": (sf, lambda o: jnp.sum(o[0])),
            "step_istftpad": (sp, lambda o: jnp.sum(o[0])),
        }
        results = {}
        for rep in range(REPS):  # interleaved: relay drift shows as spread
            for name, (fn, probe) in fns.items():
                dt = slope_time(fn, audios, N_ITERS, probe)
                results.setdefault(name, []).append(dt)
                print(
                    f"  rep{rep} {name:14s} {dt*1e3:8.2f} ms/call "
                    f"({audio_sec/dt:9.0f}x rt)",
                    flush=True,
                )
        mins = {k: min(v) for k, v in results.items()}
        a, b = "step_plain", "step_istftpad"
        win = b if mins[b] < mins[a] else a
        print(
            f"  => {a} {mins[a]*1e3:.2f} ms  {b} {mins[b]*1e3:.2f} ms"
            f"  | winner: {win}",
            flush=True,
        )


if __name__ == "__main__":
    main()
