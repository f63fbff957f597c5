"""Bare-op probe: does XLA:TPU's int8 dot actually run at 2x bf16 here?

The full-tick A/B (quant_tick_ab.py) measured int8 LOSING x0.911 at
B=4096 despite v5e's nominal 2x int8 MXU rate. Rough budget: the GRU-shape
matmul savings should be ~2 ms/tick and the quant/dequant VPU adds <1 ms —
a 5 ms loss means either (a) the int8 dot_general doesn't lower to the
native int8 MXU path at these shapes (XLA upcasts and runs it as a float
matmul plus conversion traffic), or (b) the int8 operand layout (32x128
tiling vs 8x128 f32 / 16x128 bf16) forces relayouts around every in-scan
dot. This measures the bare contractions interleaved in one process:

  [R, 400] @ [400, 400]   — the in-scan GRU gate shape (R = B*C rows)
  [R, 400] @ [400, 1200]  — the fused-projection shape
  [R, 54*161] style front shapes are MXU-friendly already; skip.

for bf16 x bf16 -> f32, int8 x int8 -> int32, and int8 -> int32 with the
dequant mul fused after (the production form). Bare-op numbers do NOT
transfer to the step (STATUS round-3 item 17) — this probe only answers
the mechanism question (is the int8 unit reachable at all), not whether
the tier should ship.

Run on chip:  python benchmarks/int8_dot_probe.py   (PROBE_ROWS=8192)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup, slope_from_run  # noqa: E402

bench_setup()

import jax
import jax.numpy as jnp
import numpy as np

ROWS = int(os.environ.get("PROBE_ROWS", "8192"))
ITERS = int(os.environ.get("PROBE_ITERS", "30"))
REPS = 3


def _mk_dot(out_dtype):
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=out_dtype
        )

    return dot


def main() -> int:
    print(f"rows={ROWS} iters={ITERS} platform={jax.devices()[0].platform}")
    rng = np.random.RandomState(0)
    for n_out in (400, 1200):
        # Operands arrive PRE-CAST in their compute dtype (like the int8
        # ones) so the measured program is the bare contraction — casting
        # f32->bf16 inside the jit would bill ~20 MB of extra HBM reads to
        # the bf16 baseline only.
        a_f = jnp.asarray(rng.randn(ROWS, 400).astype(np.float32)).astype(jnp.bfloat16)
        b_f = jnp.asarray(rng.randn(400, n_out).astype(np.float32)).astype(jnp.bfloat16)
        a8 = jnp.asarray(rng.randint(-127, 128, (ROWS, 400), np.int8))
        b8 = jnp.asarray(rng.randint(-127, 128, (400, n_out), np.int8))
        s = jnp.asarray(rng.rand(1, n_out).astype(np.float32))

        def bf16_dot(a, b):
            return _mk_dot(jnp.float32)(a, b)

        def int8_dot(a, b):
            return _mk_dot(jnp.int32)(a, b)

        def int8_deq(a, b):
            return _mk_dot(jnp.int32)(a, b).astype(jnp.float32) * s

        # Epilogue-fusion variants: the first probe run showed the bare
        # int8 dot at 1.72x bf16 for N=1200 but the int32->f32*s dequant
        # pass erasing ALL of it — these ask whether XLA can keep the
        # conversion inside the dot instead of a second HBM pass.
        def int8_f32out(a, b):
            return _mk_dot(jnp.float32)(a, b) * s

        def int8_bf16out(a, b):
            return _mk_dot(jnp.bfloat16)(a, b) * s.astype(jnp.bfloat16)

        def int8_deq_bf16(a, b):
            # Dequant pass, but storing bf16 (half the epilogue writes).
            return (
                _mk_dot(jnp.int32)(a, b).astype(jnp.bfloat16)
                * s.astype(jnp.bfloat16)
            )

        cases = [
            ("bf16", jax.jit(bf16_dot), (a_f, b_f)),
            ("int8", jax.jit(int8_dot), (a8, b8)),
            ("int8+deq", jax.jit(int8_deq), (a8, b8)),
            ("int8>f32*s", jax.jit(int8_f32out), (a8, b8)),
            ("int8>bf16*s", jax.jit(int8_bf16out), (a8, b8)),
            ("int8+deq16", jax.jit(int8_deq_bf16), (a8, b8)),
        ]
        if ROWS % 256 == 0:
            # The Pallas kernel: int32 accumulator stays in VMEM, scaled
            # float written directly (ops/matmul_q8.py). Interpret mode on
            # CPU (rehearsal only — Mosaic needs the TPU backend).
            from formula_vad_tpu.ops.matmul_q8 import matmul_q8

            interp = jax.devices()[0].platform == "cpu"
            cases.append(
                ("pallas_q8",
                 lambda a, b: matmul_q8(a, b, s, interpret=interp), (a8, b8))
            )
            cases.append(
                (
                    "pallas_q8>16",
                    lambda a, b: matmul_q8(
                        a, b, s, out_dtype=jnp.bfloat16, interpret=interp
                    ),
                    (a8, b8),
                )
            )
        flops = 2.0 * ROWS * 400 * n_out
        for name, fn, args in cases:
            out = fn(*args)
            float(jnp.max(jnp.abs(out.astype(jnp.float32))))  # warmup sync

            def run(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    o = fn(*args)
                float(jnp.max(jnp.abs(o.astype(jnp.float32))))
                return time.perf_counter() - t0

            ts = [slope_from_run(run, ITERS) for _ in range(REPS)]
            t = sorted(ts)[len(ts) // 2]
            print(
                f"  [{ROWS},400]@[400,{n_out}] {name:9s} "
                f"{t * 1e6:9.1f} us  {flops / t / 1e12:7.2f} TFLOP/s"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
