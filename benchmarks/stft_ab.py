"""A/B: predecim STFT (two-matmul decimation split) vs the fused basis.

The fused decimating segment basis ([480, 644], 2/3 structurally-zero rows)
makes the MXU perform 3x the algorithmic work — ROOFLINE.md measured
stft_segmat at ~13% of its roofline (VERDICT round-2 next-#7). The predecim
split (`offline.set_stft_predecim(True)`) decimates first with a 0/1 select
matmul ([480, 160], exact at every precision) and runs the dense decimate=1
basis ([160, 644]) on hop-wide segments: ~1/2 the performed MACs total and
a 3x smaller segment intermediate, at the cost of one extra (exact) matmul
and its [.., S+1, 160] round trip.

Measures, interleaved in ONE process (relay throttle lottery — verify
SKILL.md), slope-timed with a real device-reduction sync:

* the bare batched `segmat_prod` op at the bench shape (isolated stage), and
* the full batched front-end (`offline.window_inputs_batch`, the exact
  device step bench.py times on the host-FSM path),

with equality gates alongside. MEASURED VERDICT (2026-08-19, on chip):
the products are NOT bitwise (max |d mv| ~5.6e-9 f32 / 2.5e-5 bf16) — the
MXU's within-tile reduction tree sums the same nonzero terms at different
leaf positions when the zero rows shift the grouping (K=480-stuffed vs
K=160-dense), a ~1-ulp reassociation documented as PARITY.md deviation 13.
The gates below therefore RECORD the deviation rather than demand zero;
predecim shipped as the default on the A/B win (bare op -28% f32, full
step wins at highest and bf16_io).

Run on the real chip (cwd=/root/repo):  python benchmarks/stft_ab.py
Modes: BENCH_MODES=all for highest+bf16+bf16_io; default bf16 only.
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
from formula_vad_tpu.ops import precision
from formula_vad_tpu.pipeline import offline, vad

N_STREAMS = int(os.environ.get("BENCH_STREAMS", "21"))
N_CHUNKS = int(os.environ.get("BENCH_CHUNKS", "40"))
N_ITERS = int(os.environ.get("AB_ITERS", "12"))
REPS = 3


def make_step_fn(params, st, predecim: bool):
    # Fresh closure per variant AND per precision mode (trace-cache rule);
    # the predecim toggle is read at TRACE time, so pin it around every call
    # (the first one compiles).
    jfe = jax.jit(lambda a: offline.window_inputs_batch(params, st, a))

    def call(audio):
        offline.set_stft_predecim(predecim)
        try:
            return jfe(audio)
        finally:
            offline.set_stft_predecim(None)

    return call


def make_prod_fn(st, predecim: bool):
    tail = jnp.zeros((N_STREAMS, st.n_channels, 160 * st.downsample_rate))
    jp = jax.jit(
        lambda a: offline.segmat_prod(a, tail, st.downsample_rate)
    )

    def call(audio):
        offline.set_stft_predecim(predecim)
        try:
            return jp(audio)
        finally:
            offline.set_stft_predecim(None)

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

    mode_list = [("bf16", "default", "f32")]
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

        # Bitwise gates, fresh per mode. The predecim product carries the
        # 768-padded basis's zero lanes (stft.segmat_basis_padded_arr);
        # compare the consumed 4*n_bins columns.
        pf, pp = make_prod_fn(st, False), make_prod_fn(st, True)
        n_cols = 4 * (320 // 2 + 1)
        prod_gate = bool(
            jnp.all(pf(audios[0])[..., :n_cols] == pp(audios[0])[..., :n_cols])
        )
        sf, sp = make_step_fn(params, st, False), make_step_fn(params, st, True)
        b_mv, b_rt, b_va = sf(audios[0])
        g_mv, g_rt, g_va = sp(audios[0])
        step_gate = bool(
            jnp.all(b_mv == g_mv) & jnp.all(b_rt == g_rt) & jnp.all(b_va == g_va)
        )
        mv_dev = float(jnp.max(jnp.abs(b_mv - g_mv)))
        print(
            f"== mode={mode_name} ==  prod bitwise: {prod_gate}  "
            f"step bitwise: {step_gate}  (max |d mv| = {mv_dev:.3e})",
            flush=True,
        )

        fns = {
            "prod_fused": (pf, lambda o: jnp.max(jnp.abs(o))),
            "prod_predecim": (pp, lambda o: jnp.max(jnp.abs(o))),
            "step_fused": (sf, lambda o: jnp.sum(o[0])),
            "step_predecim": (sp, lambda o: jnp.sum(o[0])),
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
        for pair in (("prod_fused", "prod_predecim"), ("step_fused", "step_predecim")):
            a, b = pair
            win = b if mins[b] < mins[a] else a
            print(
                f"  => {a} {mins[a]*1e3:.2f} ms  {b} {mins[b]*1e3:.2f} ms"
                f"  | winner: {win}",
                flush=True,
            )


if __name__ == "__main__":
    main()
