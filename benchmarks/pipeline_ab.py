"""A/B: cross-slab pipelined front-end vs the plain batched front-end.

PARITY.md deviation 12 (`offline.window_inputs_pipelined`): slab s+1's
segment-basis matmul rides inside slab s's GRU scan (one row slice per scan
step), so the steady-state device step has no standalone front-end stage.
benchmarks/fe_overlap_ab.py probes whether the TensorCore hides xs-fed MXU
dots inside the scan at a synthetic shape; THIS benchmark measures the real
production step end-to-end and decides whether FVAD_SLAB_PIPELINE flips
default-on (VERDICT round-2 #4, second lever).

Also asserts ON CHIP that the rider's row-sliced segment product is bitwise
the one-shot `segmat_prod` (the MXU's contraction order is row-count-
independent — the expectation PARITY.md deviation 12 records; XLA:CPU is
only <=1-ulp close). A pipelined headline may only be published if this
assertion passes.

Measures at the bench shape (21 streams x 2 ch x 40 chunks = 20 s calls),
plain vs pipelined, interleaved reps in ONE process (relay throttle
lottery — verify SKILL.md), slope-timed with a real device-reduction sync.

Run on the real chip (cwd=/root/repo):  python benchmarks/pipeline_ab.py
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


def make_plain_fn(params, st):
    def fe(audio):
        return offline.window_inputs_batch(params, st, audio)

    return jax.jit(fe)


def make_pipe_fns(params, st):
    def init_carry(b):
        return jax.vmap(
            lambda _: offline.init_slab_carry(st.n_channels, st.downsample_rate)
        )(jnp.arange(b))

    def prod_fn(audio, raw_tail):
        # predecim=False: the rider path always computes the FUSED-basis
        # product (644 cols) — the gate's `want` must be the same program,
        # not the global predecim default (768-col padded), or the bitwise
        # compare raises a shape mismatch (same vacuous/broken-gate class
        # as fe0458a).
        return offline.segmat_prod(
            audio, raw_tail, st.downsample_rate, predecim=False
        )

    def fe(audio, prod, den_carry, audio_next):
        den_carry, mv, rt, va, prod_next = offline.window_inputs_batch_pipelined(
            params, st, audio, prod, den_carry, audio_next
        )
        return mv, rt, va, prod_next, den_carry

    return init_carry, jax.jit(prod_fn), jax.jit(fe)


def make_flat_fns(params, st):
    # Flat overlap (offline.window_inputs_flat): the next slab's product as
    # an independent op in the same program — materialize scoring path, XLA
    # schedules the overlap itself (no rider). Round-3 candidate after the
    # rider modes lost.
    def fe(audio, prod, den_carry, audio_next):
        den_carry, mv, rt, va, prod_next = offline.window_inputs_batch_flat(
            params, st, audio, prod, den_carry, audio_next
        )
        return mv, rt, va, prod_next, den_carry

    return jax.jit(fe)


def make_deep_fns(params, st):
    def init_deep(b):
        return jax.vmap(
            lambda _: offline.init_deep_state(
                st.n_channels, N_CHUNKS, st.fft_size, st.downsample_rate
            )
        )(jnp.arange(b))

    def fe(audio, prod, deep, den_carry, audio_next):
        den_carry, deep, (mv, rt, va), prod_next = offline.window_inputs_batch_deep(
            params, st, audio, prod, deep, den_carry, audio_next
        )
        return mv, rt, va, prod_next, deep, den_carry

    return init_deep, jax.jit(fe)


from benchmarks._timing import slope_from_run as slope_time  # noqa: E402


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
        for _ in range(3)
    ]
    n_aud = len(audios)

    for mode_name, level, io in mode_list:
        precision.set_matmul_precision(level)
        precision.set_io_dtype(io)
        plain = make_plain_fn(params, st)
        init_carry, prod_fn, pipe = make_pipe_fns(params, st)
        flat = make_flat_fns(params, st)
        init_deep, deep_fe = make_deep_fns(params, st)

        # --- on-chip bitwise gates ---------------------------------------
        # (1) stage-1 rider product == one-shot product;
        # (2) stage-2 (deep) emission == plain window inputs.
        carry0 = init_carry(N_STREAMS)
        prod0 = prod_fn(audios[0], carry0["raw_tail"])
        _, _, _, prod1, _ = pipe(audios[0], prod0, carry0, audios[1])
        tail = 160 * st.downsample_rate  # NSNET2_N_HOP * rate
        want = prod_fn(audios[1], audios[0][..., -tail:])
        same = bool(jnp.all(prod1 == want))
        maxd = float(jnp.max(jnp.abs(prod1.astype(jnp.float32) - want.astype(jnp.float32))))

        deep0 = init_deep(N_STREAMS)
        _, _, _, prodd, dp, dc = deep_fe(audios[0], prod0, deep0, carry0, audios[1])
        d_mv, d_rt, d_va = deep_fe(audios[1], prodd, dp, dc, audios[2])[:3]
        p_mv, p_rt, p_va = plain(audios[0])
        deep_same = bool(
            jnp.all(d_mv == p_mv) & jnp.all(d_rt == p_rt) & jnp.all(d_va == p_va)
        )
        deep_maxd = float(jnp.max(jnp.abs(d_mv - p_mv)))

        # (3) flat window inputs == plain (identical ops, different program
        # boundaries — MXU dots are context-independent, so chip expects
        # bitwise; XLA:CPU's bf16 lowering is context-dependent).
        f_mv, f_rt, f_va = flat(audios[0], prod0, carry0, audios[1])[:3]
        flat_same = bool(
            jnp.all(f_mv == p_mv) & jnp.all(f_rt == p_rt) & jnp.all(f_va == p_va)
        )
        flat_maxd = float(jnp.max(jnp.abs(f_mv - p_mv)))
        print(
            f"== mode={mode_name} ==  rider-prod bitwise: {same}"
            + ("" if same else f"  (max |d| = {maxd:.3e} — DO NOT flip default)")
            + f"  deep-emission bitwise: {deep_same}"
            + ("" if deep_same else f"  (max |d| = {deep_maxd:.3e})")
            + f"  flat bitwise: {flat_same}"
            + ("" if flat_same else f"  (max |d| = {flat_maxd:.3e})"),
            flush=True,
        )

        def run_plain(n):
            out = None
            t0 = time.perf_counter()
            for i in range(n):
                out = plain(audios[i % n_aud])
            float(jnp.sum(out[0]))
            return time.perf_counter() - t0

        def run_pipe(n):
            dc = carry0
            prod = prod0
            out = None
            t0 = time.perf_counter()
            for i in range(n):
                out = pipe(audios[i % n_aud], prod, dc, audios[(i + 1) % n_aud])
                prod, dc = out[3], out[4]
            float(jnp.sum(out[0]))
            return time.perf_counter() - t0

        def run_flat(n):
            dc = carry0
            prod = prod0
            out = None
            t0 = time.perf_counter()
            for i in range(n):
                out = flat(audios[i % n_aud], prod, dc, audios[(i + 1) % n_aud])
                prod, dc = out[3], out[4]
            float(jnp.sum(out[0]))
            return time.perf_counter() - t0

        def run_deep(n):
            dp, dc = deep0, carry0
            prod = prod0
            out = None
            t0 = time.perf_counter()
            for i in range(n):
                out = deep_fe(
                    audios[i % n_aud], prod, dp, dc, audios[(i + 1) % n_aud]
                )
                prod, dp, dc = out[3], out[4], out[5]
            float(jnp.sum(out[0]))
            return time.perf_counter() - t0

        run_plain(1)  # compile
        run_flat(1)
        run_pipe(1)
        run_deep(1)
        results = {}
        for rep in range(REPS):  # interleaved: relay drift shows as spread
            for name, run in (
                ("plain", run_plain), ("flat", run_flat),
                ("pipelined", run_pipe), ("deep", run_deep),
            ):
                dt = slope_time(run, N_ITERS)
                results.setdefault(name, []).append(dt)
                print(
                    f"  rep{rep} {name:10s} {dt*1e3:8.2f} ms/call "
                    f"({audio_sec/dt:9.0f}x rt)",
                    flush=True,
                )
        mins = {k: min(v) for k, v in results.items()}
        winner = min(mins, key=mins.get)
        gate_ok = {
            "plain": True,
            "flat": flat_same,
            "pipelined": same,
            "deep": same and deep_same,
        }
        print(
            "  => "
            + "  ".join(f"{k} {v*1e3:.2f} ms" for k, v in mins.items())
            + f"  | winner: {winner}"
            + ("" if gate_ok[winner] else "  [blocked by bitwise gate]"),
            flush=True,
        )


if __name__ == "__main__":
    main()
