"""Explicitly lane-padded iSTFT basis (FVAD_ISTFT_PAD) vs the plain form.

The padded program (ops/stft.py::_inv_segmat_basis_padded) zero-pads BOTH
contraction dims of the inverse-basis matmul to 128-lane multiples
(K 322->384 zero rows, N 320->384 zero cols). The zero K rows occupy the
same tile positions as XLA's implicit K pad and the zero N cols are sliced
off, so the contract is BITWISE equality — measured max|d| = 0.0 on chip
at highest/bf16/bf16_io (benchmarks/tail_layout_exp.py) and asserted
bitwise here on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import NSNET2_N_FFT
from formula_vad_tpu.ops import precision, stft
from formula_vad_tpu.pipeline import denoiser as den_mod


@pytest.fixture(autouse=True)
def _restore_toggles():
    yield
    stft.set_istft_pad(None)  # back to the env/shipping default
    precision.set_matmul_precision("highest")
    precision.set_io_dtype("f32")


def _spec(seed, shape):
    rng = np.random.default_rng(seed)
    return jnp.asarray(0.1 * rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("level", ["highest", "high", "default"])
def test_padded_istft_bitwise(level):
    precision.set_matmul_precision(level)
    nb = NSNET2_N_FFT // 2 + 1
    re = _spec(0, (3, 2, 20, nb))
    im = _spec(1, (3, 2, 20, nb))

    # Trace-cache rule (test_stft_predecim.py): the toggle is read at TRACE
    # time, so each variant gets a fresh function object.
    stft.set_istft_pad(False)
    base = jax.jit(
        lambda r, i: stft.istft_segmat(r, i, den_mod._WINDOW, NSNET2_N_FFT)
    )(re, im)
    stft.set_istft_pad(True)
    got = jax.jit(
        lambda r, i: stft.istft_segmat(r, i, den_mod._WINDOW, NSNET2_N_FFT)
    )(re, im)

    assert got.shape == base.shape
    assert bool(jnp.all(got == base))


def test_padded_basis_structure():
    key = hash(den_mod._WINDOW.tobytes())
    stft._SEGMAT_WINDOWS[key] = np.asarray(den_mod._WINDOW, np.float32)
    base = stft._inv_segmat_basis(key, NSNET2_N_FFT)
    padded = stft._inv_segmat_basis_padded(key, NSNET2_N_FFT)
    assert padded.shape == (384, 384)
    assert base.shape == (322, 320)
    np.testing.assert_array_equal(padded[:322, :320], base)
    assert (padded[322:, :] == 0.0).all()
    assert (padded[:, 320:] == 0.0).all()


def test_set_istft_pad_validation_and_restore():
    stft.set_istft_pad(False)
    assert stft._ISTFT_PAD is False
    stft.set_istft_pad(None)
    assert stft._ISTFT_PAD == (stft._ISTFT_PAD_ENV == "on")
