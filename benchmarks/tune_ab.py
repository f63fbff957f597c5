"""Tuner amortization A/B: K vmapped alt machines vs a plain run.

apps/tune.py's value proposition is that a K-config sweep costs ~one run,
because the denoise+FFT front-end (~98% of the step) is shared and only
the FSM decode multiplies by K (host-C decode at ~tens of ns/window, or
the vmapped scan on device).  This measures it: BatchRunner.run() over the
same batch with K=0 vs K=16 alt machines, interleaved in one process
(cross-process relay variance — verify SKILL.md).

Run on the real chip:  python benchmarks/tune_ab.py   [TA_K=16 TA_B=4]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup  # noqa: E402

bench_setup()
import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from formula_vad_tpu.config import VADConfig, VADMachineConfig  # noqa: E402
from formula_vad_tpu.models.registry import load_denoiser  # noqa: E402
from formula_vad_tpu.parallel.runner import BatchRunner  # noqa: E402

K = int(os.environ.get("TA_K", "16"))
B = int(os.environ.get("TA_B", "4"))
SECONDS = float(os.environ.get("TA_SECONDS", "120"))
REPS = int(os.environ.get("TA_REPS", "3"))

params = load_denoiser("demo")
base = VADMachineConfig()
alts = tuple(
    dataclasses.replace(base, speech_threshold_factor=6.0 + 0.5 * k)
    for k in range(K)
)

rng = np.random.default_rng(0)
t_samples = int(SECONDS * 48000)
batch = np.asarray(0.02 * rng.standard_normal((B, 2, t_samples)), np.float32)
# A second batch so repeated calls never hit any same-input caching.
batch2 = np.asarray(0.02 * rng.standard_normal((B, 2, t_samples)), np.float32)

runners = {
    "plain": BatchRunner(params, VADConfig()),
    f"alt{K}": BatchRunner(params, VADConfig(alt_vad_machine_configs=alts)),
}

for name, r in runners.items():
    r.run(batch)  # compile
    print(f"{name} compiled", flush=True)

for rep in range(REPS):
    line = []
    for name, r in runners.items():
        t0 = time.perf_counter()
        r.run(batch)
        r.run(batch2)
        dt = (time.perf_counter() - t0) / 2
        line.append(f"{name}={dt * 1e3:.1f} ms")
    print(f"rep{rep} " + "  ".join(line), flush=True)

print(f"\n{B} streams x {SECONDS:.0f} s, K={K} extra machines; "
      "ratio alt/plain is the sweep's marginal cost", flush=True)
