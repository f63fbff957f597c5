"""bf16 activation-storage tier (``precision.set_io_dtype("bf16")``).

The speed tier stores the denoiser path's big activations in bfloat16 to
halve HBM traffic (ROOFLINE.md: the non-MXU part of the step is
bandwidth/latency-bound). These tests pin its contract on CPU:

* decision parity on a representative synthetic corpus vs full f32 —
  boundary-identical segments here; rare one-window shifts are the
  documented tolerance of the bf16 tiers (PARITY.md),
* cross-path consistency within the mode (scan == offline segments),
* the activations genuinely ARE bf16 (no silent f32 re-promotion at a
  carry join or basis constant), while decision-feeding reductions (band
  volumes, FSM inputs) and all carries stay f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import precision, stft, windows
from formula_vad_tpu.pipeline import offline, vad


@pytest.fixture(autouse=True)
def _restore_io():
    yield
    precision.set_io_dtype("f32")


@pytest.fixture(scope="module")
def params():
    return nsnet2.load(None)


@pytest.fixture(scope="module")
def st():
    return vad.statics_from_config(VADConfig())


@pytest.fixture(scope="module")
def corpus(st):
    rng = np.random.default_rng(3)
    n_chunks = 30
    t = n_chunks * st.chunk_size
    tt = np.arange(t) / 48000.0
    streams = []
    for i in range(3):
        a = (0.004 * rng.standard_normal((2, t))).astype(np.float32)
        env = np.zeros(t)
        for s, d in [(1.5, 2.2), (7.0, 1.1)]:
            env[int((s + i * 0.37) * 48000):int((s + i * 0.37 + d) * 48000)] = 1.0
        sp = (0.22 * np.sin(2 * np.pi * (650 + 60 * i) * tt)
              + 0.13 * np.sin(2 * np.pi * 1500 * tt)) * env
        streams.append(a + np.stack([sp, 0.85 * sp]).astype(np.float32))
    return np.stack(streams)


def _offline_segments(params, st, audio):
    win, valid = offline.process_batch_offline(params, st, audio, use_pallas_fsm=False)
    valid = np.asarray(valid)
    out = []
    for i in range(audio.shape[0]):
        so = jax.tree_util.tree_map(lambda x: x[i], win)
        out.append(vad.segments_from_outputs(
            st, vad.ChunkOutput(windows=so, window_valid=valid[i], denoised=None)))
    return out


def test_bf16_io_decisions_match_f32(params, st, corpus):
    f32 = _offline_segments(params, st, corpus)
    precision.set_io_dtype("bf16")
    b16 = _offline_segments(params, st, corpus)
    assert any(f32), "corpus must produce segments"
    assert b16 == f32


def test_bf16_io_scan_matches_offline(params, st, corpus):
    precision.set_io_dtype("bf16")
    off = _offline_segments(params, st, corpus)
    scan = []
    for i in range(corpus.shape[0]):
        _, outs = vad.process_stream(params, st, jnp.asarray(corpus[i]))
        scan.append(vad.segments_from_outputs(st, jax.device_get(outs)))
    # Same tier, two formulations: decisions must agree on the corpus (the
    # band stage's lerp fold vs materialized upsample is a PARITY.md
    # deviation-8-class difference, now at bf16 rounding).
    assert [[(s["sample_from"], s["sample_to"]) for s in x] for x in scan] == \
           [[(s["sample_from"], s["sample_to"]) for s in x] for x in off]


def test_bf16_io_dtypes(params, st, corpus):
    precision.set_io_dtype("bf16")
    audio = jnp.asarray(corpus[0])

    # Spectra come out bf16 straight from the fused matmul.
    window = windows.sqrt_hann_symmetric(320)
    re, im = stft.stft_segmat(audio, window, 320, decimate=3)
    assert re.dtype == jnp.bfloat16 and im.dtype == jnp.bfloat16

    # The 16 kHz denoised stream is bf16; the carries stay f32.
    carry = offline.init_slab_carry(2, 3)
    completed, prev, new_carry = offline.denoise_offline_16k(params, audio, carry)
    assert completed.dtype == jnp.bfloat16
    assert all(v.dtype == jnp.float32 for v in jax.tree_util.tree_leaves(new_carry))

    # Model gains are bf16 end-to-end.
    feats = jnp.zeros((4, 54, 161), jnp.float32)
    gains = nsnet2.apply(params, feats, out_frames=50)
    assert gains.dtype == jnp.bfloat16

    # Decision-feeding reductions are f32.
    band = stft.band_volume_16k(
        completed, prev, vad._hann(st.fft_size), st.fft_size,
        st.norm_factor, st.min_bin, st.max_bin, 8, rate=3)
    assert band.dtype == jnp.float32
    mv, rt, va = offline.window_inputs(params, st, audio, jnp.int32(30))
    assert mv.dtype == jnp.float32 and rt.dtype == jnp.float32


def test_io_off_is_pure_f32(params, st, corpus):
    """With the tier off (default) nothing changes dtype anywhere."""
    audio = jnp.asarray(corpus[0])
    window = windows.sqrt_hann_symmetric(320)
    re, _ = stft.stft_segmat(audio, window, 320, decimate=3)
    assert re.dtype == jnp.float32
    gains = nsnet2.apply(params, jnp.zeros((2, 54, 161), jnp.float32), out_frames=50)
    assert gains.dtype == jnp.float32
