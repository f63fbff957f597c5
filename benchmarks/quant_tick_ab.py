"""Int8 serving-tier A/B: the full online tick, bf16 vs int8 model, one process.

The serving tick at B >= ~10k streams is MXU-throughput bound at ~25% of
the bf16 peak (ROOFLINE.md "online tick"; the 0.5 s budget — not HBM — now
binds the ceiling at ~36.4k streams). v5e issues int8 x int8 -> int32 at
2x the bf16 rate, so an int8-quantized denoiser model
(models/nsnet2_q8.py, FVAD_QUANT=int8) is the one unprobed lever left on
the tick. NOTE this is the opposite regime from the B=21 offline bench,
where the GRU is serial-latency bound and quantization was pre-judged
pointless (ROOFLINE "dead ends") — throughput serving is where int8 can
pay.

Measures, interleaved in ONE process (cross-process numbers are relay
lottery — verify SKILL.md):

  float — the shipping serving tick (FVAD_PRECISION / FVAD_IO_DTYPE from
          the environment; the production tier is default+bf16_io)
  int8  — same tick with the quantized model (set_quant at trace time)

at the events-only + pcm16 + shared-fill serving shape (the densest tier),
full-step scope (STFT + model + accumulator + volume — bare-op wins are
known not to transfer, STATUS round-3 item 17). Also reports the window-
input deviation between the variants (min_vol / ratios rel err) as a
quick numeric-sanity row; decision-level quality is measured separately
(benchmarks/precision_sweep.py int8 row, tests/test_quant.py).

Run on chip:
  FVAD_PRECISION=default FVAD_IO_DTYPE=bf16 python benchmarks/quant_tick_ab.py
Knobs: AB_B (default 4096), AB_ITERS (default 8), AB_REPS (default 3).
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

from formula_vad_tpu.config import VADConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import precision
from formula_vad_tpu.pipeline import vad

B = int(os.environ.get("AB_B", "4096"))
ITERS = int(os.environ.get("AB_ITERS", "8"))
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> int:
    params = nsnet2.load(None)
    st = vad.statics_from_config(VADConfig())
    print(
        f"B={B} iters={ITERS} precision={os.environ.get('FVAD_PRECISION', 'highest')} "
        f"io={os.environ.get('FVAD_IO_DTYPE', 'f32')} platform={jax.devices()[0].platform}"
    )

    def make_step():
        # A FRESH function object per variant: jit's trace cache is keyed on
        # the underlying callable, so wrapping one shared function would
        # hand variant 2 variant 1's jaxpr and the quant toggle (a trace-
        # time global) would silently never apply — the A/B would compare
        # the float program against itself.
        def batched_step(carries, chunks, valid, start):
            chunks = chunks.astype(jnp.float32) / np.float32(32768.0)  # pcm16
            return jax.vmap(
                lambda c, a, v: vad.chunk_step(
                    params, st, c, a, chunk_valid=v, run_fsm=False,
                    collect_denoised=False, shared_start=start,
                )
            )(carries, chunks, valid)

        return jax.jit(batched_step)

    variants = [("float", "off"), ("int8", "int8")]
    steps = {name: make_step() for name, _ in variants}

    # Resident on-device inputs (only PRNG keys cross the tunnel).
    def gen(key):
        x = 0.02 * jax.random.normal(key, (B, st.n_channels, st.chunk_size), jnp.float32)
        return jnp.clip(jnp.round(x * 32768.0), -32768, 32767).astype(jnp.int16)

    chunks = jax.jit(gen)(jax.random.PRNGKey(0))
    valid = jnp.ones((B,), bool)
    carries = {
        name: jax.vmap(lambda _: vad.init_carry(st))(jnp.arange(B))
        for name, _ in variants
    }
    fills = {name: 0 for name, _ in variants}

    def tick(name):
        start = jnp.int32(st.fft_size - fills[name])
        carries[name], out = steps[name](carries[name], chunks, valid, start)
        fills[name] = (fills[name] + st.chunk_size) % st.fft_size
        return out

    # Warmup = trace: quant mode is baked in at trace time per variant.
    outs = {}
    for name, quant in variants:
        precision.set_quant(quant)
        try:
            outs[name] = tick(name)
            float(jnp.max(outs[name].min_vol.astype(jnp.float32)))
        finally:
            precision.set_quant("off")

    # Numeric sanity: window-input deviation after a few identical-input
    # ticks (tick 1's windows are mostly still filling / masked — comparing
    # them alone can read 0 even when the variants genuinely differ).
    for name, _ in variants:
        for _ in range(2):
            outs[name] = tick(name)
    mv_f = np.asarray(outs["float"].min_vol, np.float64)
    mv_q = np.asarray(outs["int8"].min_vol, np.float64)
    rt_f = np.asarray(outs["float"].ratios, np.float64)
    rt_q = np.asarray(outs["int8"].ratios, np.float64)
    denom = max(np.abs(mv_f).max(), 1e-30)
    mv_dev = np.abs(mv_q - mv_f).max() / denom
    print(
        f"window-input deviation: min_vol rel {mv_dev:.3e}  "
        f"ratios abs {np.abs(rt_q - rt_f).max():.3e}"
        "  (ratios derive from the ORIGINAL audio — 0 expected)"
    )
    if mv_dev == 0.0:
        # min_vol derives from the DENOISED audio: int8 gains MUST move it.
        # Exit non-zero so an unattended queue run records the failure in
        # its ledger instead of logging a float-vs-itself timing as a
        # verdict (the trace-cache failure mode this harness was bitten by).
        print("ERROR: zero min_vol deviation — the int8 trace did not "
              "apply; a timing run would compare float against itself "
              "(vacuous A/B). Aborting without timing.")
        return 4

    def run_fn(name):
        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = tick(name)
            float(jnp.max(out.min_vol.astype(jnp.float32)))
            return time.perf_counter() - t0

        return run

    results = {name: [] for name, _ in variants}
    for rep in range(REPS):
        for name, _ in variants:  # interleaved: same throttle environment
            dt = slope_from_run(run_fn(name), ITERS)
            results[name].append(dt * 1e3)
            print(f"rep{rep} {name:6s} {dt * 1e3:8.2f} ms/tick")
    med = {name: sorted(v)[len(v) // 2] for name, v in results.items()}
    ratio = med["float"] / med["int8"] if med["int8"] else float("nan")
    print(
        f"\nmedian float {med['float']:.2f} ms  int8 {med['int8']:.2f} ms  "
        f"speedup x{ratio:.3f}  ({'int8 WINS' if ratio > 1.02 else 'int8 does not win'})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
