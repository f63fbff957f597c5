"""On-chip low-latency-mode scale curve: per-hop latency vs batch size.

`pipeline/lowlatency.py` processes 10 ms hops with a carried GRU state
(algorithmic latency one hop + one hop OLA lookahead, vs the chunk path's
500 ms). README claims it "runs far inside its real-time budget on a
directly-attached chip" — this measures that: the per-hop device latency of
`jit(vmap(step))` at B concurrent streams, via the slope of carry-CHAINED
steps (each step consumes the previous state, so dispatches cannot overlap
and the slope IS the true device step latency; the relay's fixed ~30 ms
round-trip cancels — verify SKILL.md measurement rules).

Real-time criterion: per-hop latency < 10 ms. End-to-end added latency on a
directly-attached chip = hop compute + one-hop lookahead.

Run on the real chip from the repo root:  python benchmarks/lowlatency_scale.py
  LL_BS=64,256,1024,4096  LL_ITERS=60  FVAD_PRECISION=default for the bf16 tier.
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
from formula_vad_tpu.pipeline import lowlatency

BS = tuple(int(x) for x in os.environ.get("LL_BS", "64,256,1024,4096").split(","))
ITERS = int(os.environ.get("LL_ITERS", "60"))
N_CH = 2
HOP48 = 480


def measure(b: int, params) -> dict:
    jstep = jax.jit(lambda s, h: lowlatency.step(params, s, h))
    state = lowlatency.init_state((b, N_CH))
    gen = jax.jit(
        lambda key: 0.02 * jax.random.normal(key, (b, N_CH, HOP48), jnp.float32)
    )
    hops = [gen(jax.random.PRNGKey(i)) for i in range(2)]

    state, out = jstep(state, hops[0])  # compile
    float(jnp.max(jnp.abs(out)))
    state0 = state

    def run(n):
        s = state0
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            s, out = jstep(s, hops[i % 2])
        float(jnp.max(jnp.abs(out)))
        return time.perf_counter() - t0

    hop = slope_from_run(run, ITERS)
    return {
        "b": b,
        "ms_per_hop": hop * 1e3,
        "fits_10ms": hop < 0.010,
        "streams_ceiling": int(b * 0.010 / hop),
    }


def main():
    params = nsnet2.load(None)
    print(f"precision={os.environ.get('FVAD_PRECISION', 'highest')}")
    print(f"{'B':>6} {'ms/hop':>8} {'<10ms':>6} {'ceiling':>8}")
    for b in BS:
        try:
            r = measure(b, params)
        except Exception as e:
            msg = str(e)
            if (
                "RESOURCE_EXHAUSTED" in msg
                or "Ran out of memory" in msg
                or "out of memory" in msg.lower()
            ):
                print(f"{b:>6}  HBM ceiling")
                break
            raise
        print(
            f"{r['b']:>6} {r['ms_per_hop']:>8.2f} {str(r['fits_10ms']):>6} "
            f"{r['streams_ceiling']:>8}"
        )


if __name__ == "__main__":
    main()
