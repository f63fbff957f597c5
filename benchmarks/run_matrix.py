"""Benchmark matrix: realtime factor across batch sizes, precision levels,
and pipeline paths (offline chunk-parallel vs streaming scan).

Usage:  python benchmarks/run_matrix.py [--quick]
Prints one JSON line per configuration. Run on the real accelerator
(the default platform); bench.py remains the driver's single-number entry.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(fn, audios, audio_sec, iters=9):
    """Per-call slope timing with a real device sync (block_until_ready is a
    no-op through the axon relay; distinct input buffers defeat result
    caching — see .claude/skills/verify/SKILL.md)."""
    out = fn(audios[0])
    float(jnp.max(jnp.abs(out.astype(jnp.float32))))  # compile + true sync

    def run(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(audios[i % len(audios)])
        float(jnp.max(jnp.abs(out.astype(jnp.float32))))
        return time.perf_counter() - t0

    short = max(2, iters // 3)
    dt = (run(iters) - run(short)) / (iters - short)
    return audio_sec / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from formula_vad_tpu.config import VADConfig
    from formula_vad_tpu.models import nsnet2
    from formula_vad_tpu.ops import precision
    from formula_vad_tpu.pipeline import offline, vad

    st = vad.statics_from_config(VADConfig())
    n_chunks = 20 if args.quick else 40
    rng = np.random.default_rng(0)
    use_pallas = jax.devices()[0].platform != "cpu"

    results = []
    for prec in ("highest", "high", "default"):
        precision.set_matmul_precision(prec)
        params = nsnet2.load(None)
        for n_streams in (21, 84) if not args.quick else (21,):
            audios = [
                jnp.asarray(
                    0.02
                    * rng.standard_normal((n_streams, 2, n_chunks * st.chunk_size)),
                    jnp.float32,
                )
                for _ in range(2)
            ]
            audio_sec = n_streams * n_chunks * st.chunk_size / st.sample_rate

            fn_off = jax.jit(
                lambda a: offline.process_batch_offline(
                    params, st, a, use_pallas_fsm=use_pallas
                )[0].event
            )
            rtf = measure(fn_off, audios, audio_sec)
            row = {
                "path": "offline",
                "precision": prec,
                "streams": n_streams,
                "realtime_factor": round(rtf, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

        # streaming scan path at the plan batch size (latency-oriented)
        audios = [
            jnp.asarray(
                0.02 * rng.standard_normal((21, 2, n_chunks * st.chunk_size)),
                jnp.float32,
            )
            for _ in range(2)
        ]
        audio_sec = 21 * n_chunks * st.chunk_size / st.sample_rate
        fn_scan = jax.jit(
            jax.vmap(lambda a: vad.process_stream(params, st, a)[1].windows.event)
        )
        rtf = measure(fn_scan, audios, audio_sec)
        row = {
            "path": "streaming-scan",
            "precision": prec,
            "streams": 21,
            "realtime_factor": round(rtf, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    precision.set_matmul_precision("highest")
    return 0


if __name__ == "__main__":
    sys.exit(main())
