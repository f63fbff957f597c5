"""A/B: fully-folded spectra->band conv vs the materialize-16k scoring chain.

PARITY.md deviation 11 (`stft.band_volume_spec`) replaces
istft_segmat -> OLA -> band_volume_16k with ONE strided conv from the gained
spectra. Algorithmically the conv does ~2.5x the MXU FLOPs of the chain
(kernel [34, 322, 990] per 5120-sample block vs istft [322, 320] + band
[1024, 198] matmuls), but it removes the [F, hop]->stream relayout, the
OLA shift-add, and the 16 kHz stream's HBM round trip — which of those
wins on real silicon decides whether FVAD_BAND_COMPOSITE stays default-on
(ROOFLINE.md "front-end" decomposition; VERDICT round-2 weak #4's
stft/istft tail).

Measures the full batched front-end (`offline.window_inputs_batch`, the
exact device step bench.py times on the host-FSM path) at the bench shape
(21 streams x 2 ch x 40 chunks), composite on vs off, interleaved reps in
ONE process (relay throttle lottery — verify SKILL.md), slope-timed with a
real device-reduction sync.

Run on the real chip (cwd=/root/repo):  python benchmarks/band_fold_ab.py
Modes: BENCH_MODES=all for highest+bf16+bf16_io; default bf16 only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup  # noqa: E402

bench_setup()

import jax
import jax.numpy as jnp
import numpy as np

from formula_vad_tpu.config import VADConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import precision
from formula_vad_tpu.pipeline import offline, vad

N_STREAMS = int(os.environ.get("BENCH_STREAMS", "21"))
N_CHUNKS = int(os.environ.get("BENCH_CHUNKS", "40"))
N_ITERS = int(os.environ.get("AB_ITERS", "12"))
REPS = 3


def make_fn(params, st, mode_env: str):
    # Fresh closure per variant AND per precision mode (trace-cache rule);
    # band_composite_enabled()/variant() are read at TRACE time, so pin the
    # env var around every call (the first one compiles).
    def fe(audio):
        mv, rt, va = offline.window_inputs_batch(params, st, audio)
        return mv, rt, va

    jfe = jax.jit(fe)

    def call(audio):
        old = os.environ.get("FVAD_BAND_COMPOSITE")
        os.environ["FVAD_BAND_COMPOSITE"] = mode_env
        try:
            return jfe(audio)
        finally:
            if old is None:
                os.environ.pop("FVAD_BAND_COMPOSITE", None)
            else:
                os.environ["FVAD_BAND_COMPOSITE"] = old

    return call


from benchmarks._timing import slope_from_run  # noqa: E402


def slope_time(fn, audios, n_long):
    mv, _, _ = fn(audios[0])
    float(jnp.sum(mv))  # compile + true sync

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(audios[i % len(audios)])
        float(jnp.sum(out[0]))
        return time.perf_counter() - t0

    return slope_from_run(run, n_long)


def main():
    params = nsnet2.load(None)
    st = vad.statics_from_config(VADConfig())
    audio_sec = N_STREAMS * N_CHUNKS * st.chunk_size / st.sample_rate

    mode_list = [("bf16", "default", "f32")]
    if os.environ.get("BENCH_MODES") == "all":
        mode_list = [
            ("highest", "highest", "f32"),
            ("bf16", "default", "f32"),
            ("bf16_io", "default", "bf16"),
        ]
    rng = np.random.default_rng(0)
    audios = [
        jnp.asarray(
            0.02 * rng.standard_normal((N_STREAMS, 2, N_CHUNKS * st.chunk_size)),
            jnp.float32,
        )
        for _ in range(2)
    ]
    for mode_name, level, io in mode_list:
        precision.set_matmul_precision(level)
        precision.set_io_dtype(io)
        fns = {
            "composite": make_fn(params, st, "on"),
            "comp_split": make_fn(params, st, "split"),
            "materialize": make_fn(params, st, "off"),
        }
        print(f"== mode={mode_name} ==", flush=True)
        results = {}
        for rep in range(REPS):  # interleaved: relay drift shows as spread
            for name, fn in fns.items():
                dt = slope_time(fn, audios, N_ITERS)
                results.setdefault(name, []).append(dt)
                print(
                    f"  rep{rep} {name:12s} {dt*1e3:8.2f} ms/call "
                    f"({audio_sec/dt:9.0f}x rt)",
                    flush=True,
                )
        mins = {k: min(v) for k, v in results.items()}
        winner = min(mins, key=mins.get)
        print(
            "  => "
            + "  ".join(f"{k} {v*1e3:.2f} ms" for k, v in mins.items())
            + f"  | winner: {winner}",
            flush=True,
        )


if __name__ == "__main__":
    main()
