"""Denoising-quality bar for the shipping gain models (VERDICT r4 next-#3).

The neural component's job is noise suppression (NSNet2.zig:161-237), but
until round 5 nothing measured that the packaged demo weights actually
improve SNR — a regression halving their denoising quality while
preserving burst detection would have passed the whole suite. These tests
pin SI-SDR-improvement floors on held-out synthetic pairs (seeds the
packaged training run never saw), measured through the SHIPPING chunked
pipeline with a unity-gain pipeline as the aligned reference (see
eval/denoise_quality.py). Measured 2026-08-20 (CPU, 3 pairs x 16 s):
demo +29.5 dB, spectral_gate +10.2 dB, random-init +0.5 dB — the floors
below leave wide margins so only a real quality regression trips them.
"""

import os

import numpy as np
import pytest

from formula_vad_tpu.eval import denoise_quality as dq
from formula_vad_tpu.models import registry

needs_weights = pytest.mark.skipif(
    not os.path.exists(registry.DEMO_WEIGHTS),
    reason="packaged demo weights not present",
)


def test_si_sdr_metric_properties():
    rng = np.random.default_rng(0)
    ref = rng.standard_normal(4800).astype(np.float32)
    # Perfect (even rescaled) estimate: huge positive score.
    assert dq.si_sdr(ref, ref) > 100.0
    assert dq.si_sdr(2.5 * ref, ref) > 100.0  # scale invariance
    # 10 dB SNR additive noise scores ~10 dB.
    noise = rng.standard_normal(4800).astype(np.float32)
    noise *= np.linalg.norm(ref) / np.linalg.norm(noise) / (10 ** 0.5)
    assert dq.si_sdr(ref + noise, ref) == pytest.approx(10.0, abs=1.5)
    # Orthogonal-ish estimate: strongly negative.
    assert dq.si_sdr(noise, ref) < -5.0
    with pytest.raises(ValueError):
        dq.si_sdr(ref, np.zeros(4800))


def test_identity_pipeline_is_transparent():
    """The unity-gain pipeline reconstructs its (decimated) input — the
    aligned-reference trick in evaluate() relies on this."""
    ((noisy, clean),) = dq.held_out_pairs(1, 12.0)
    assert np.any(clean)  # redraw guarantees a non-empty speech component
    out = dq.pipeline_denoise(dq.IdentityGains(), clean)
    # Compare against the clean signal itself over the overlapping span:
    # identical up to decimation/OLA-latency artifacts, so correlation with
    # a 48k->16k->48k round-trip stays very high. Cheap sanity: energy is
    # preserved within a few percent (silence regions stay silent).
    assert out.shape[0] == clean.shape[0]
    e_in = float(np.sum(clean[:, : out.shape[1]] ** 2))
    e_out = float(np.sum(out**2))
    assert e_out == pytest.approx(e_in, rel=0.25)


@needs_weights
def test_demo_weights_si_sdr_floor():
    params = registry.load_denoiser("demo")
    res = dq.evaluate(params, n_pairs=2, seconds=16.0)
    assert res["mean_si_sdr_impr_db"] >= 15.0, res
    for row in res["pairs"]:
        assert row["si_sdr_impr_db"] >= 10.0, res


def test_spectral_gate_si_sdr_floor():
    params = registry.load_denoiser("spectral_gate")
    res = dq.evaluate(params, n_pairs=2, seconds=16.0)
    assert res["mean_si_sdr_impr_db"] >= 3.0, res


@needs_weights
def test_demo_beats_spectral_gate_and_random():
    """Ranking sanity: trained weights > classical gate > random-init.
    (random-init scoring ~0 shows the metric discriminates — it is not
    awarding points for merely attenuating everything.)"""
    demo = dq.evaluate(registry.load_denoiser("demo"), n_pairs=1, seconds=16.0)
    gate = dq.evaluate(
        registry.load_denoiser("spectral_gate"), n_pairs=1, seconds=16.0
    )
    rand = dq.evaluate(registry.load_denoiser("random"), n_pairs=1, seconds=16.0)
    assert (
        demo["mean_si_sdr_impr_db"]
        > gate["mean_si_sdr_impr_db"]
        > rand["mean_si_sdr_impr_db"]
    )
    assert rand["mean_si_sdr_impr_db"] < 3.0
