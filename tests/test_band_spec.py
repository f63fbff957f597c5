"""The fully-folded scoring band path (``stft.band_volume_spec``).

``band_volume_spec`` evaluates the SAME linear operator as
istft_segmat -> +OLA-tail -> truncate -> band_volume_16k, folded into one
strided convolution from the gained spectra (PARITY.md deviation 11).
These tests pin:

* numerical equivalence to the materialize-16k reference chain across
  block-aligned, non-aligned, tiny, and boundary-spill shapes,
* carry equivalence of ``denoise_offline_spec`` vs ``denoise_offline_16k``,
* segment identity of the composite scoring path vs the scan path,
* slab chaining: chained composite calls == one whole-stream call.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import NSNET2_N_FFT, VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import stft
from formula_vad_tpu.pipeline import denoiser as den_mod
from formula_vad_tpu.pipeline import offline, vad

HOP = NSNET2_N_FFT // 2  # 160
CFG = VADMachineConfig(long_term_speech_avg_sec=10.0)


@pytest.fixture(autouse=True)
def _composite_on(monkeypatch):
    # The on-chip A/B picked materialize as the production default
    # (ROOFLINE.md "Band-fold dead end"); these tests exist to pin the
    # composite path's numerics, so force it on. Tests of the off/split
    # forms re-set the env themselves.
    monkeypatch.setenv("FVAD_BAND_COMPOSITE", "on")


@pytest.fixture(scope="module")
def st():
    return vad.statics_from_config(VADConfig(vad_machine_config=CFG))


def reference_band(re_g, im_g, prev16, out_tail_prev, st, n_windows):
    """The materialize-16k chain the fold must reproduce."""
    f = re_g.shape[-2]
    ola = stft.istft_segmat(re_g, im_g, den_mod._WINDOW, NSNET2_N_FFT)
    ola = ola.at[..., :HOP].add(out_tail_prev)
    completed = ola[..., : f * HOP]
    return stft.band_volume_16k(
        completed, prev16, vad._hann(st.fft_size), st.fft_size,
        st.norm_factor, st.min_bin, st.max_bin, n_windows,
        rate=st.downsample_rate,
    )


@pytest.mark.parametrize("variant", ["dense", "split"])
@pytest.mark.parametrize(
    "f,n_windows",
    [
        (2000, 937),  # the bench shape: tail lands mid-block
        (1600, 750),  # block-aligned stream end (no tail correction)
        (50, 23),     # one chunk
        (63, 33),     # tail spills across a block boundary (nblk = 3)
        (100, 46),
        (64, 15),     # stream longer than the requested windows (nsw ≡ 0
                      # mod spb: frame 32's OLA top half lands inside the
                      # last scored window — must not be dropped)
        (70, 8),      # ditto, non-aligned window count
    ],
)
def test_matches_materialized_chain(st, f, n_windows, variant):
    rng = np.random.default_rng(f)
    shape = (2, f, NSNET2_N_FFT // 2 + 1)
    re_g = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    im_g = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    prev16 = jnp.asarray(rng.standard_normal((2,)), jnp.float32)
    out_tail = jnp.asarray(rng.standard_normal((2, HOP)), jnp.float32)

    ref = np.asarray(reference_band(re_g, im_g, prev16, out_tail, st, n_windows))
    got = np.asarray(
        stft.band_volume_spec(
            re_g, im_g, prev16, out_tail,
            den_mod._WINDOW, vad._hann(st.fft_size),
            NSNET2_N_FFT, st.fft_size, st.norm_factor,
            st.min_bin, st.max_bin, n_windows, rate=st.downsample_rate,
            variant=variant,
        )
    )
    assert got.shape == ref.shape == (2, n_windows)
    scale = np.maximum(np.abs(ref), 1e-3)
    assert np.max(np.abs(got - ref) / scale) < 2e-4


def test_carry_matches_materialized(st):
    rng = np.random.default_rng(0)
    audio = jnp.asarray(0.05 * rng.standard_normal((2, 4 * 24000)), jnp.float32)
    params = nsnet2.init_params(jax.random.PRNGKey(3))
    carry = offline.init_slab_carry(2)
    # Non-trivial incoming carry: run one slab first.
    _, _, carry = offline.denoise_offline_16k(params, audio, carry)

    _, _, c_ref = offline.denoise_offline_16k(params, audio, carry)
    _, _, c_spec = offline.denoise_offline_spec(params, audio, carry)
    np.testing.assert_array_equal(np.asarray(c_ref["raw_tail"]), np.asarray(c_spec["raw_tail"]))
    np.testing.assert_array_equal(np.asarray(c_ref["feat_ctx"]), np.asarray(c_spec["feat_ctx"]))
    np.testing.assert_allclose(
        np.asarray(c_ref["out_tail"]), np.asarray(c_spec["out_tail"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(c_ref["last_sample"]), np.asarray(c_spec["last_sample"]), atol=1e-6
    )


def speechy_audio(n_chunks, bursts, seed=0):
    rng = np.random.default_rng(seed)
    t_total = n_chunks * 24000
    t = np.arange(t_total) / 48000.0
    base = 0.003 * rng.standard_normal((2, t_total))
    env = np.zeros(t_total)
    for start_s, dur_s in bursts:
        env[int(start_s * 48000) : min(int((start_s + dur_s) * 48000), t_total)] = 1.0
    speech = (0.25 * np.sin(2 * np.pi * 700 * t) + 0.15 * np.sin(2 * np.pi * 1300 * t)) * env
    return (base + np.stack([speech, 0.9 * speech])).astype(np.float32)


def test_composite_segments_match_scan(st):
    assert offline.band_composite_enabled()  # forced on by _composite_on
    params = nsnet2.init_params(jax.random.PRNGKey(7))
    for seed, bursts in ((8, [(2.0, 2.0)]), (4, [(0.7, 0.9), (3.1, 1.3)])):
        audio = jnp.asarray(speechy_audio(16, bursts, seed=seed))
        _, outs = jax.jit(lambda a: vad.process_stream(params, st, a))(audio)
        expected = vad.segments_from_outputs(st, outs)
        assert expected, "test audio must produce segments"
        win_out, _, _ = jax.jit(
            lambda a: offline.process_stream_offline(params, st, a)
        )(audio)
        got = offline.segments_from_offline(st, win_out)
        assert got == expected, f"seed {seed}"


def test_split_variant_segments_match_scan(st, monkeypatch):
    monkeypatch.setenv("FVAD_BAND_COMPOSITE", "split")
    assert offline.band_composite_variant() == "split"
    params = nsnet2.init_params(jax.random.PRNGKey(7))
    audio = jnp.asarray(speechy_audio(16, [(0.7, 0.9), (3.1, 1.3)], seed=4))
    _, outs = jax.jit(lambda a: vad.process_stream(params, st, a))(audio)
    expected = vad.segments_from_outputs(st, outs)
    assert expected
    win_out, _, _ = jax.jit(
        lambda a: offline.process_stream_offline(params, st, a)
    )(audio)
    assert offline.segments_from_offline(st, win_out) == expected


def test_composite_min_vol_close_to_materialized(st, monkeypatch):
    params = nsnet2.init_params(jax.random.PRNGKey(7))
    audio = jnp.asarray(speechy_audio(10, [(1.5, 2.0)], seed=5))
    carry = offline.init_slab_carry(2)
    nv = jnp.int32(10)

    res_on = offline.window_inputs_carry(params, st, audio, carry, nv)
    monkeypatch.setenv("FVAD_BAND_COMPOSITE", "off")
    res_off = offline.window_inputs_carry(params, st, audio, carry, nv)
    mv_on, mv_off = np.asarray(res_on[1]), np.asarray(res_off[1])
    scale = np.maximum(np.abs(mv_off), 1e-5)
    assert np.max(np.abs(mv_on - mv_off) / scale) < 2e-4
    np.testing.assert_array_equal(np.asarray(res_on[2]), np.asarray(res_off[2]))


def test_composite_slab_chaining(st):
    """Two chained composite slabs == one whole-stream composite call
    (same segments; band values agree to the deviation-11 tolerance)."""
    params = nsnet2.init_params(jax.random.PRNGKey(9))
    # Slab size must be lcm(chunk, fft)-aligned: 32 chunks = 768000 samples.
    audio = speechy_audio(64, [(3.0, 2.5), (9.1, 1.2)], seed=11)
    a = jnp.asarray(audio)

    carry = offline.init_slab_carry(2)
    mv_parts = []
    for s in range(2):
        sl = a[:, s * 32 * 24000 : (s + 1) * 32 * 24000]
        carry, mv, rt, vld, _ = offline.window_inputs_carry(
            params, st, sl, carry, jnp.int32(32)
        )
        mv_parts.append(np.asarray(mv))
    chained = np.concatenate(mv_parts, axis=-1)

    carry0 = offline.init_slab_carry(2)
    _, mv_full, _, _, _ = offline.window_inputs_carry(
        params, st, a, carry0, jnp.int32(64)
    )
    full = np.asarray(mv_full)
    scale = np.maximum(np.abs(full), 1e-5)
    assert np.max(np.abs(chained - full) / scale) < 2e-4
