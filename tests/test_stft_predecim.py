"""Predecim STFT (two-matmul decimation split) vs fused zero-stuffed basis.

The fused decimating basis (ops/stft.py::_segmat_basis, decimate=3) is 2/3
structurally-zero rows — the MXU performs 3x the algorithmic work
(ROOFLINE.md: stft_segmat at 13% of its roofline). The predecim split
(offline.segmat_prod with set_stft_predecim(True)) decimates first with a
0/1 select matmul and runs the dense decimate=1 basis (explicitly 768-lane
zero-padded, `stft.segmat_basis_padded_arr`) on hop-wide segments.

Contract (PARITY.md deviation 13): the two programs differ by backend
reduction-tree reassociation only — ~1 ulp per product entry (measured
~1e-6 on CPU at bench scales; the on-chip deltas live in
benchmarks/stft_ab.py's gate output) — and the padded basis's extra lanes
are EXACT zeros (zero basis columns). Decision-level invariance (segments,
reports) is pinned by the full suite running under the predecim default.

Trace-cache rule: predecim is read at TRACE time, so every variant must be
jitted as a FRESH function object — `jax.jit(offline.segmat_prod)` twice
shares one pjit cache and silently reuses the first trace (this file
originally did exactly that, asserting a vacuous fused==fused).
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
def test_segmat_prod_tracks_fused(level):
    precision.set_matmul_precision(level)
    audio = _rand_audio(0, 2, 24000 * 2)
    tail = _rand_audio(1, 2, 480)

    base = jax.jit(lambda a, t: offline.segmat_prod(a, t, predecim=False))(
        audio, tail
    )
    got = jax.jit(lambda a, t: offline.segmat_prod(a, t, predecim=True))(
        audio, tail
    )

    # Same rows; predecim carries the 768-padded basis's extra columns.
    n_cols = base.shape[-1]  # 4 * n_bins = 644
    assert got.shape[:-1] == base.shape[:-1]
    assert got.shape[-1] >= n_cols
    # Pad lanes are EXACT zeros (zero basis columns).
    assert bool(jnp.all(got[..., n_cols:] == 0.0))
    # Consumed columns: reassociation-only deltas (~1 ulp; measured ~1e-6
    # on CPU at this scale — PARITY.md deviation 13).
    np.testing.assert_allclose(
        np.asarray(got[..., :n_cols]), np.asarray(base), rtol=0, atol=1e-5
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
