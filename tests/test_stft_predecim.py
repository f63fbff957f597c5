"""Predecim STFT (two-matmul decimation split) == fused zero-stuffed basis.

The fused decimating basis (ops/stft.py::_segmat_basis, decimate=3) is 2/3
structurally-zero rows — the MXU performs 3x the algorithmic work
(ROOFLINE.md: stft_segmat at 13% of its roofline). The predecim split
(offline.segmat_prod with set_stft_predecim(True)) decimates first with a
0/1 select matmul and runs the dense decimate=1 basis on hop-wide segments.

Contract: BITWISE-identical products at every precision level — each select
output is one 1.0*x plus exact +0.0 terms, and adding +0.0 never perturbs
an f32 partial sum, so both programs accumulate the same nonzero terms in
the same order (stft._decim_sel docstring). Pinned here on CPU at f32; the
on-chip gate runs inside benchmarks/stft_ab.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig
from formula_vad_tpu.models import nsnet2, registry
from formula_vad_tpu.ops import precision
from formula_vad_tpu.pipeline import offline, vad


@pytest.fixture(autouse=True)
def _restore_toggles():
    yield
    offline.set_stft_predecim(None)  # back to the env/shipping default
    precision.set_matmul_precision("highest")
    precision.set_io_dtype("f32")


def _rand_audio(seed, c, t):
    rng = np.random.default_rng(seed)
    return jnp.asarray(0.05 * rng.standard_normal((c, t)), jnp.float32)


@pytest.mark.parametrize("level", ["highest", "high", "default"])
def test_segmat_prod_bitwise(level):
    precision.set_matmul_precision(level)
    audio = _rand_audio(0, 2, 24000 * 2)
    tail = _rand_audio(1, 2, 480)

    offline.set_stft_predecim(False)
    base = jax.jit(offline.segmat_prod)(audio, tail)
    offline.set_stft_predecim(True)
    got = jax.jit(offline.segmat_prod)(audio, tail)

    assert base.shape == got.shape
    assert bool(jnp.all(base == got)), (
        f"max |d| = {float(jnp.max(jnp.abs(base - got)))}"
    )


def test_full_step_windows_track():
    """The host-FSM device step's window inputs are unchanged.

    ratios/valid are raw-audio-derived — bitwise everywhere. min_vol flows
    through the denoised stream inside ONE fused program, where XLA:CPU's
    context-dependent fusion reassociates downstream dots (~1 ulp — the
    same backend effect the flat-overlap gate documents, PARITY.md
    deviation 12); the MXU's dot is context-independent, so the bitwise
    min_vol gate runs on chip inside benchmarks/stft_ab.py."""
    params = registry.load_denoiser(None)
    st = vad.statics_from_config(VADConfig())
    rng = np.random.default_rng(7)
    audio = jnp.asarray(
        0.05 * rng.standard_normal((2, st.n_channels, 4 * st.chunk_size)),
        jnp.float32,
    )

    offline.set_stft_predecim(False)
    b_mv, b_rt, b_va = jax.jit(
        lambda a: offline.window_inputs_batch(params, st, a)
    )(audio)
    offline.set_stft_predecim(True)
    g_mv, g_rt, g_va = jax.jit(
        lambda a: offline.window_inputs_batch(params, st, a)
    )(audio)

    # ulp-level STFT reassociation amplified through log-power + GRU:
    # measured max ~4.5e-5 relative on CPU (~0.0004 dB against the decision
    # chain's >=0.1 dB margins; decisions pinned by the full suite).
    assert bool(jnp.allclose(b_mv, g_mv, rtol=1e-3, atol=1e-6))
    assert bool(jnp.all(b_rt == g_rt))
    assert bool(jnp.all(b_va == g_va))
