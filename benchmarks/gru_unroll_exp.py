"""Scan-unroll experiment on the NSNet2 GRU stack (the binding stage).

The recurrence's cost is per-step latency on a 54-iteration serial chain
(x2 layers), not throughput (ROOFLINE.md decomposition). `lax.scan`'s
`unroll=u` stitches u iteration bodies into one loop body — the ops and
their order are unchanged (bitwise-expected: a pure loop transform), but
XLA schedules a u-step window at once, overlapping step t's VPU gate math
with step t+1's carry-independent work and paying loop bookkeeping 1/u as
often.

Measures the FULL production model stage (`nsnet2.apply_streaming`, the
shipping split3/fused program per mode) at unroll 1/2/3/6, interleaved in
one process (relay throttle lottery — verify SKILL.md), slope-timed with a
real device-reduction sync, bitwise gates vs unroll=1 alongside.

Decision rule: a factor must win >=5% on the stage in >=2 of 3 reps AND
pass its bitwise gate before FVAD_GRU_UNROLL's default moves.

Run on chip:  python benchmarks/gru_unroll_exp.py   (BENCH_MODES=all for 3 modes)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup, slope_from_run  # noqa: E402

bench_setup()

import jax
import jax.numpy as jnp

from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import precision

ROWS = int(os.environ.get("BENCH_ROWS", "1680"))  # 21 streams x 2 ch x 40 chunks
T = int(os.environ.get("BENCH_T", "54"))
OUT_FRAMES = 50
N_ITERS = int(os.environ.get("AB_ITERS", "10"))
REPS = 3
UNROLLS = tuple(
    int(u) for u in os.environ.get("UNROLLS", "1,2,3,6").split(",")
)


def make_fn(params, unroll: int):
    # Fresh closure per variant AND per mode (trace-cache rule); the unroll
    # knob is read at TRACE time, so pin it around every call.
    st = nsnet2.zero_state((ROWS,))
    jf = jax.jit(
        lambda p, s, f: nsnet2.apply_streaming(p, s, f, out_frames=OUT_FRAMES)
    )

    def call(feats):
        nsnet2.set_gru_unroll(unroll)
        try:
            return jf(params, st, feats)
        finally:
            nsnet2.set_gru_unroll(None)

    return call


def slope_time(fn, feats, n_long):
    def probe(o):
        return jnp.max(jnp.abs(o[1].astype(jnp.float32)))

    float(probe(fn(feats[0])))

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(feats[i % 2])
        float(probe(out))
        return time.perf_counter() - t0

    return slope_from_run(run, n_long)


def main():
    params = nsnet2.init_params(jax.random.PRNGKey(0))
    mode_list = [("bf16", "default", "f32"), ("bf16_io", "default", "bf16")]
    if os.environ.get("BENCH_MODES") == "all":
        mode_list = [
            ("highest", "highest", "f32"),
            ("bf16", "default", "f32"),
            ("bf16_io", "default", "bf16"),
        ]
    gen = jax.jit(
        lambda key: -8.0
        + 2.0 * jax.random.normal(key, (ROWS, T, nsnet2.N_BINS), jnp.float32)
    )
    feats = [gen(jax.random.PRNGKey(i)) for i in range(2)]

    for mode_name, level, io in mode_list:
        precision.set_matmul_precision(level)
        precision.set_io_dtype(io)
        fns = {u: make_fn(params, u) for u in UNROLLS}
        print(f"== mode={mode_name} ==", flush=True)
        base = fns[UNROLLS[0]](feats[0])
        for u in UNROLLS[1:]:
            got = fns[u](feats[0])
            bit = bool(
                jnp.all(got[1] == base[1])
                & jnp.all(got[0][0] == base[0][0])
                & jnp.all(got[0][1] == base[0][1])
            )
            d = float(
                jnp.max(
                    jnp.abs(got[1].astype(jnp.float32) - base[1].astype(jnp.float32))
                )
            )
            print(
                f"  gate unroll={u}: bitwise {bit}  (max|d gains| = {d:.3e})",
                flush=True,
            )
        results = {}
        for rep in range(REPS):
            for u, fn in fns.items():
                dt = slope_time(fn, feats, N_ITERS)
                results.setdefault(u, []).append(dt)
                print(f"  rep{rep} unroll={u}  {dt*1e3:7.2f} ms", flush=True)
        mins = {u: min(v) for u, v in results.items()}
        print(
            "  => " + "  ".join(f"u{u} {v*1e3:.2f}" for u, v in mins.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
