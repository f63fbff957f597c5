"""Empirical evidence for the precision ladder (ops/precision.py).

Runs the full offline VAD over randomized synthetic-corpus streams at each
FVAD_PRECISION level and reports, per level, how many segment boundaries
deviate from the ``highest`` (parity) configuration and by how much. This
turns the ladder's documented claims ("high ~ f32 quality", "default may
shift a boundary by one 21 ms window on marginal audio") into measured
numbers on the current platform.

    python benchmarks/precision_sweep.py           # real TPU
    FVAD_CHECK_CPU=1 python benchmarks/precision_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

import jax
import jax.numpy as jnp
import numpy as np

import make_synthetic_corpus as mkc
from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import registry
from formula_vad_tpu.ops import precision
from formula_vad_tpu.pipeline import offline, vad

SECONDS = 60.0
N_SEEDS = 4


def main() -> int:
    if os.environ.get("FVAD_CHECK_CPU"):
        jax.config.update("jax_platforms", "cpu")
    print(f"platform: {jax.devices()[0].platform}")
    params = registry.load_denoiser(None)
    cfg = VADConfig(vad_machine_config=VADMachineConfig(long_term_speech_avg_sec=10.0))
    st = vad.statics_from_config(cfg)

    streams = []
    for seed in range(N_SEEDS):
        rng = np.random.default_rng(300 + seed)
        audio, _ = mkc.synth_stream(rng, SECONDS)
        k = audio.shape[1] // st.chunk_size
        streams.append(jnp.asarray(audio[:, : k * st.chunk_size]))

    def segs_at(level, quant="off"):
        precision.set_matmul_precision(level)
        precision.set_quant(quant)
        out = []
        for a in streams:
            # new jit per level: precision is baked in at trace time
            win_out, _, _ = jax.jit(
                lambda x: offline.process_stream_offline(params, st, x)
            )(a)
            out.append(offline.segments_from_offline(st, win_out))
        return out

    base = segs_at("highest")
    n_base = sum(len(s) for s in base)
    print(f"highest: {n_base} segments over {N_SEEDS} x {SECONDS:.0f}s streams (baseline)")

    # The int8 serving tier (FVAD_QUANT=int8, models/nsnet2_q8.py) rides the
    # same methodology: default matmuls + an int8-quantized denoiser model.
    for level, quant in (("high", "off"), ("default", "off"), ("default", "int8")):
        got = segs_at(level, quant)
        level = level if quant == "off" else f"{level}+{quant}"
        n_diff_count = sum(len(a) != len(b) for a, b in zip(base, got))
        max_shift = 0
        n_shifted = 0
        for a, b in zip(base, got):
            if len(a) != len(b):
                continue
            for sa, sb in zip(a, b):
                for key in ("sample_from", "sample_to"):
                    d = abs(sa[key] - sb[key])
                    if d:
                        n_shifted += 1
                        max_shift = max(max_shift, d)
        print(
            f"{level:8s}: {n_diff_count} stream(s) changed segment count; "
            f"{n_shifted} boundaries shifted, max shift "
            f"{max_shift} samples ({max_shift / st.fft_size:.1f} windows)"
        )
    precision.set_matmul_precision("highest")
    precision.set_quant("off")
    return 0


if __name__ == "__main__":
    sys.exit(main())
