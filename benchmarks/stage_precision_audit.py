"""Per-stage precision audit for the parity-fast tier (VERDICT r3 next-#4).

The parity headline (`highest`) pays 6 bf16 MXU passes on EVERY matmul,
but the predecim select matmul already proved (PARITY.md dev. 13) that
some contractions reconstruct exactly at 3 passes. This audit measures,
for each named matmul stage of the scoring path (ops/precision.py STAGES):

1. EXACTNESS — run the full FSM-input chain (window_inputs_batch) at
   `highest` with ONLY that stage dropped to HIGH (3-pass); compare the
   window inputs (mv/rt/va) to the all-highest baseline: bitwise-equal?
   max relative mv deviation? Also audit the cumulative composite (all
   stages at HIGH == the `high` tier) and any all-bitwise-stages
   composite (the shippable `parity-fast` tier: bitwise window inputs
   inherit the ENTIRE parity evidence chain).
2. SPEED — interleaved A/B (plain highest vs each composite) so the win
   per stage is attributable.

Decision rule: a stage joins `parity-fast` only if its window inputs are
BITWISE equal on the audit batch (and the tier-fuzz campaign then pins
decisions at the composite). If no stage passes, this script's numbers
are the ROOFLINE dead-end ledger entry.

Run from the repo root on the chip:  python benchmarks/stage_precision_audit.py
Env: SPA_STREAMS (default 8), SPA_CHUNKS (default 20), SPA_REPS (default 3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup, slope_from_run  # noqa: E402

bench_setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from formula_vad_tpu.config import VADConfig  # noqa: E402
from formula_vad_tpu.models import nsnet2  # noqa: E402
from formula_vad_tpu.ops import precision  # noqa: E402
from formula_vad_tpu.pipeline import offline, vad  # noqa: E402


def main() -> int:
    b = int(os.environ.get("SPA_STREAMS", "8"))
    n_chunks = int(os.environ.get("SPA_CHUNKS", "20"))
    reps = int(os.environ.get("SPA_REPS", "3"))
    # Bitwise 3-vs-6-pass equality depends on the ACTUAL weight values, so
    # the admission decision must be made on the shipping weights — the
    # packaged demo weights (the production neural path), like
    # benchmarks/tier_fuzz.py. SPA_WEIGHTS=random for the fuzz-seed set.
    if os.environ.get("SPA_WEIGHTS", "demo") == "random":
        params = nsnet2.load(None)
    else:
        from formula_vad_tpu.models.registry import load_denoiser

        params = load_denoiser("demo")
    st = vad.statics_from_config(VADConfig())
    audio = jax.jit(
        lambda key: 0.02
        * jax.random.normal(key, (b, 2, n_chunks * st.chunk_size), jnp.float32)
    )(jax.random.PRNGKey(3))

    def make_fe():
        def fe(a):
            return offline.window_inputs_batch(params, st, a)

        return jax.jit(fe)

    def outputs(overrides):
        precision.set_matmul_precision("highest")
        precision.set_stage_overrides(overrides)
        try:
            fe = make_fe()
            mv, rt, va = fe(audio)
            return fe, (np.asarray(mv), np.asarray(rt), np.asarray(va))
        finally:
            precision.set_stage_overrides(None)

    print(f"platform={jax.devices()[0].platform} B={b} chunks={n_chunks} "
          f"weights={os.environ.get('SPA_WEIGHTS', 'demo')}")
    fe_base, base = outputs({})
    bitwise_stages = []
    rows = []
    for stage in precision.STAGES:
        _, got = outputs({stage: "high"})
        eq = all(np.array_equal(g, w) for g, w in zip(got, base))
        denom = np.maximum(np.abs(base[0]), 1e-12)
        rel = float(np.max(np.abs(got[0] - base[0]) / denom))
        rows.append((stage, eq, rel))
        if eq:
            bitwise_stages.append(stage)
        print(f"stage {stage:6s}: bitwise={eq}  max_rel_mv={rel:.3e}")

    composites = {}
    if bitwise_stages:
        comp = {s: "high" for s in bitwise_stages}
        _, got = outputs(comp)
        eq = all(np.array_equal(g, w) for g, w in zip(got, base))
        print(f"composite parity-fast {bitwise_stages}: bitwise={eq}")
        if eq:
            composites["parity_fast"] = comp

    # ---- speed: interleaved A/B of plain vs each composite --------------
    def timed(fe):
        def run(n):
            out = None
            t0 = time.perf_counter()
            for _ in range(n):
                out = fe(audio)
            float(jnp.max(jnp.abs(out[0])))
            return time.perf_counter() - t0

        run(1)
        return run

    variants = {"highest": fe_base}
    for name, comp in composites.items():
        precision.set_matmul_precision("highest")
        precision.set_stage_overrides(comp)
        try:
            variants[name] = make_fe()
            variants[name](audio)
        finally:
            precision.set_stage_overrides(None)
    # the all-HIGH rung for scale (the ceiling a full composite could reach)
    precision.set_matmul_precision("high")
    variants["high"] = make_fe()
    variants["high"](audio)
    precision.set_matmul_precision("highest")

    timed_runs = {k: timed(v) for k, v in variants.items()}
    samples = {k: [] for k in variants}
    for _ in range(reps):
        for k, run in timed_runs.items():
            samples[k].append(slope_from_run(run, 12))
    for k, xs in samples.items():
        ms = sorted(xs)[len(xs) // 2] * 1e3
        print(f"timing {k:12s}: median {ms:7.2f} ms  "
              f"(min {min(xs) * 1e3:.2f}, max {max(xs) * 1e3:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
