"""Can independent MXU work hide inside the GRU scan? (cross-slab pipelining probe)

ROOFLINE.md §"Why not higher MFU?": the binding resource of the bf16 step is
the GRU recurrence — 54 scan steps whose per-step gate math runs on the VPU
while the MXU idles between the small per-step projections. Deeper batching
was measured as a dead end (batch_scale.py: per-audio-second cost RISES past
B=21). The remaining lever is SOFTWARE PIPELINING: during slab k's GRU scan,
the MXU could execute slab k+1's front-end matmuls (stft_segmat is
independent of everything downstream of the previous slab's features).

XLA cannot hoist independent ops INTO a `lax.scan` (the loop body is a
sub-computation compiled as one basic block), so a fused 2-slab program
does not overlap by itself. But if the independent matmul is fed THROUGH
the scan as an xs slice, it lands in the same loop-body schedule as the
gate math, and the TensorCore's static scheduler can issue MXU dots
concurrently with VPU gate ops.

This probe measures, at the bench shape (R=1680 GRU rows, T=54 steps,
stft = [84240, 480] @ [480, 644]):

  gru        : the production GRU scan alone (layer-by-layer, both layers)
  stft_mm    : the stft-sized matmul alone (one big dot)
  both_flat  : gru + stft_mm in one jit, NOT interleaved (XLA's own schedule)
  fused_stft : scan body additionally dots a [1560, 480] stft slice per step
  fused_more : body also dots an istft-sized [1556, 322] @ [322, 320] slice

If t(fused_stft) ~= max(t(gru), t(stft_mm)) the pipeline can hide the whole
front-end of slab k+1 inside slab k's recurrence; if it ~= the sum, the body
serializes and this is a measured dead end (ROOFLINE gets the numbers either
way).

Run on the real chip (cwd=/root/repo):  python benchmarks/fe_overlap_ab.py
Modes: BENCH_MODES=both for f32(highest)+bf16; default bf16 only.
All comparisons in ONE process, slope-timed, inputs rotated (verify SKILL.md).
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

from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import precision

R = int(os.environ.get("OVL_ROWS", "1680"))  # 21 streams x 2 ch x 40 chunks
T = 54
SROWS = int(os.environ.get("OVL_SROWS", "1560"))  # 54*1560 ~ 42x2001 stft rows
ZROWS = int(os.environ.get("OVL_ZROWS", "1556"))  # 54*1556 ~ 42x2000 istft rows
N_ITERS = int(os.environ.get("OVL_ITERS", "10"))
REPS = 2


def make_fns(params, dtype):
    g1, g2 = params.gru1, params.gru2
    basis = jnp.asarray(np.random.default_rng(1).standard_normal((480, 644)), dtype)
    inv = jnp.asarray(np.random.default_rng(2).standard_normal((322, 320)), dtype)
    prec = precision.matmul_precision()

    def gru_scan(gi1_t, h0):
        def step(carry, gi1_i):
            h1, h2 = carry
            h1 = nsnet2.gru_cell_pre(g1, h1, gi1_i)
            h2 = nsnet2.gru_cell(g2, h2, h1)
            return (h1, h2), h2

        (h1, h2), ys = jax.lax.scan(step, (h0, h0), gi1_t)
        return h1, h2, ys

    def gru(gi1_t, h0, segs_t, z_t):
        h1, h2, ys = gru_scan(gi1_t, h0)
        return jnp.max(jnp.abs(ys)) + jnp.max(jnp.abs(h1))

    def stft_mm(gi1_t, h0, segs_t, z_t):
        flat = segs_t.reshape(-1, 480)
        prod = jnp.matmul(flat, basis, precision=prec)
        return jnp.max(jnp.abs(prod))

    def both_flat(gi1_t, h0, segs_t, z_t):
        return gru(gi1_t, h0, segs_t, z_t) + stft_mm(gi1_t, h0, segs_t, z_t)

    def fused_stft(gi1_t, h0, segs_t, z_t):
        def step(carry, xs):
            gi1_i, seg_i = xs
            h1, h2 = carry
            h1 = nsnet2.gru_cell_pre(g1, h1, gi1_i)
            h2 = nsnet2.gru_cell(g2, h2, h1)
            prod = jnp.matmul(seg_i, basis, precision=prec)
            return (h1, h2), (h2, prod)

        (h1, h2), (ys, prods) = jax.lax.scan(step, (h0, h0), (gi1_t, segs_t))
        return jnp.max(jnp.abs(ys)) + jnp.max(jnp.abs(h1)) + jnp.max(jnp.abs(prods))

    def fused_more(gi1_t, h0, segs_t, z_t):
        def step(carry, xs):
            gi1_i, seg_i, z_i = xs
            h1, h2 = carry
            h1 = nsnet2.gru_cell_pre(g1, h1, gi1_i)
            h2 = nsnet2.gru_cell(g2, h2, h1)
            prod = jnp.matmul(seg_i, basis, precision=prec)
            oth = jnp.matmul(z_i, inv, precision=prec)
            return (h1, h2), (h2, prod, oth)

        (h1, h2), (ys, prods, oths) = jax.lax.scan(
            step, (h0, h0), (gi1_t, segs_t, z_t)
        )
        return (
            jnp.max(jnp.abs(ys))
            + jnp.max(jnp.abs(h1))
            + jnp.max(jnp.abs(prods))
            + jnp.max(jnp.abs(oths))
        )

    return {
        "gru": gru,
        "stft_mm": stft_mm,
        "both_flat": both_flat,
        "fused_stft": fused_stft,
        "fused_more": fused_more,
    }


from benchmarks._timing import slope_from_run  # noqa: E402


def slope_time(fn, inputs, n_long):
    out = fn(*inputs[0])
    float(out)  # compile + real sync (block_until_ready is a relay no-op)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for i in range(n):
            o = fn(*inputs[i % len(inputs)])
        float(o)
        return time.perf_counter() - t0

    return slope_from_run(run, n_long)


def main():
    params = nsnet2.load(None)
    modes = ["default"]
    if os.environ.get("BENCH_MODES") == "both":
        modes = ["highest", "default"]
    for level in modes:
        precision.set_matmul_precision(level)
        dtype = jnp.float32 if level == "highest" else jnp.bfloat16
        p = params
        if dtype != jnp.float32:
            p = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
        fns = {k: jax.jit(v) for k, v in make_fns(p, dtype).items()}
        rng = np.random.default_rng(0)
        inputs = [
            (
                jnp.asarray(0.1 * rng.standard_normal((T, R, 1200)), dtype),
                jnp.zeros((R, 400), dtype),
                jnp.asarray(0.1 * rng.standard_normal((T, SROWS, 480)), dtype),
                jnp.asarray(0.1 * rng.standard_normal((T, ZROWS, 322)), dtype),
            )
            for _ in range(2)
        ]
        print(f"== precision={level} dtype={dtype.__name__} ==", flush=True)
        results = {}
        for rep in range(REPS):  # interleaved reps: relay drift shows up as spread
            for name, fn in fns.items():
                dt = slope_time(fn, inputs, N_ITERS)
                results.setdefault(name, []).append(dt)
                print(f"  rep{rep} {name:11s} {dt*1e3:8.2f} ms", flush=True)
        g = min(results["gru"])
        s = min(results["stft_mm"])
        f = min(results["fused_stft"])
        print(
            f"  => gru {g*1e3:.2f} + stft {s*1e3:.2f} = {(g+s)*1e3:.2f} ms serial; "
            f"fused {f*1e3:.2f} ms "
            f"(overlap recovers {(g+s-f)*1e3:.2f} ms, "
            f"{100*(g+s-f)/s if s else 0:.0f}% of the stft)",
            flush=True,
        )


if __name__ == "__main__":
    main()
