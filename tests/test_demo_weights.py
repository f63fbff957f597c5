"""Packaged demo weights: registry resolution + end-to-end detection.

The reference cannot ship a working neural denoiser (its ONNX blob is an
absent LFS object, /root/reference/.MISSING_LARGE_BLOBS:1); this framework
packages NSNet2 weights trained by ``apps.train`` on the synthetic radio
corpus so the neural path works out of the box. These tests pin that
contract: the ``demo`` spec loads, and the loaded model actually detects
speech bursts on corpus-like audio.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig
from formula_vad_tpu.models import nsnet2, registry
from formula_vad_tpu.pipeline import offline, vad

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)
import make_synthetic_corpus  # noqa: E402

needs_weights = pytest.mark.skipif(
    not os.path.exists(registry.DEMO_WEIGHTS),
    reason="packaged demo weights not present",
)


@needs_weights
def test_demo_spec_loads_f32():
    params = registry.load_denoiser("demo")
    assert isinstance(params, nsnet2.NSNet2Params)
    # f16-stored, upcast on load: compute dtype must be f32.
    assert params.gru1.wh.dtype == jnp.float32
    gains = nsnet2.apply(params, jnp.zeros((6, 161), jnp.float32))
    assert np.isfinite(np.asarray(gains)).all()


def test_missing_demo_weights_fall_back_with_loud_warning(monkeypatch, caplog):
    """Default spec (None) must still work when the packaged npz is absent —
    random-init NSNet2 with a WARNING naming the missing file — while the
    explicit 'demo' spec raises."""
    import logging

    monkeypatch.setattr(registry, "DEMO_WEIGHTS", "/nonexistent/demo.npz")
    with caplog.at_level(logging.WARNING, logger="fvad.pipeline"):
        params = registry.load_denoiser(None)
    assert isinstance(params, nsnet2.NSNet2Params)
    assert any("RANDOM-INIT" in r.message for r in caplog.records)
    with pytest.raises(FileNotFoundError):
        registry.load_denoiser("demo")


@needs_weights
def test_demo_weights_detect_synthetic_speech():
    """Full pipeline with the packaged weights on a fresh (unseen-seed)
    synthetic stream: every labeled burst overlaps a detected segment."""
    rng = np.random.default_rng(20260816)
    seconds = 40.0
    audio, labels = make_synthetic_corpus.synth_stream(rng, seconds)
    assert labels, "corpus generator produced no speech bursts"

    params = registry.load_denoiser("demo")
    st = vad.statics_from_config(VADConfig())
    k = int(seconds * st.sample_rate) // st.chunk_size
    a = jnp.asarray(audio[:, : k * st.chunk_size])

    win_out, valid, _ = offline.process_stream_offline(params, st, a)
    segs = offline.segments_from_offline(st, win_out)
    sr = float(st.sample_rate)
    spans = [(s["sample_from"] / sr, s["sample_to"] / sr) for s in segs]

    missed = [
        (f, t)
        for f, t in labels
        if not any(a0 < t and b0 > f for a0, b0 in spans)
    ]
    assert not missed, f"undetected bursts: {missed} (got {spans})"
