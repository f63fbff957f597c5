"""Denoiser model registry: resolve a --denoiser spec to gain-model params.

A gain model is anything the pipeline can ask for a spectral gain mask:
either an ``NSNet2Params`` pytree (run through ``nsnet2.apply``) or any
object with an ``apply_gains(features) -> gains`` method (duck-typed; see
``apply_model``). All models share the 161-bin/20 ms frame contract.

Specs:
  None                -> the packaged demo weights when present (the
                         reference's default is likewise its packaged model,
                         VADPipeline.zig:20-26 -> data/nsnet2-20ms-baseline.onnx);
                         random-init NSNet2 (deterministic seed 0) otherwise
  "demo"              -> packaged NSNet2 demo weights (data/nsnet2_demo.npz,
                         trained by apps.train on the synthetic radio corpus
                         — the upstream blob is an absent LFS object, so
                         these make the neural path work out of the box)
  "random"            -> random-init NSNet2 (deterministic seed)
  "spectral_gate"     -> classical Wiener gate (weights-free)
  "spectral_gate:q,a,f" -> gate with explicit quantile/alpha/floor
  "*.onnx" / "*.npz"  -> NSNet2 weights from disk
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

from . import nsnet2
from .spectral_gate import SpectralGateParams
from ..utils.logging import scoped

log = scoped("pipeline")

DEMO_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "nsnet2_demo.npz",
)


def apply_model(
    params: Any, features: jnp.ndarray, out_frames: int | None = None, rider=None
) -> jnp.ndarray:
    """Run whichever gain model ``params`` is over [..., T, 161] features.

    out_frames: return gains for only the last out_frames frames (the
    callers drop the warm-up context frames; pushing the slice into the
    model lets NSNet2 skip its post-GRU dense stack on dropped frames).

    rider: optional (fn, xs) independent per-step work threaded through the
    NSNet2 time scan (see nsnet2.apply_streaming) — the cross-slab pipelined
    offline path. Duck-typed gain models have no recurrence to hide work in:
    the rider work runs after the gains instead (same outputs, the overlap
    is simply absent), keeping the pipelined runner model-agnostic."""
    apply_gains = getattr(params, "apply_gains", None)
    if apply_gains is not None:
        gains = apply_gains(features)
        if out_frames is not None and out_frames < gains.shape[-2]:
            gains = gains[..., gains.shape[-2] - out_frames :, :]
        if rider is not None:
            fn, xs = rider
            rider_ys = jax.lax.map(fn, xs)  # no scan to ride: run it plainly
            return gains, rider_ys
        return gains
    return nsnet2.apply(params, features, out_frames, rider=rider)


def load_denoiser(spec: str | None, *, seed: int = 0) -> Any:
    if spec is None:
        if os.path.exists(DEMO_WEIGHTS):
            log.info("denoiser: packaged demo weights (%s)", DEMO_WEIGHTS)
            return nsnet2.load_npz(DEMO_WEIGHTS)
        log.warning(
            "denoiser: packaged demo weights missing (%s) — falling back to "
            "RANDOM-INIT NSNet2; detections will be meaningless. Pass "
            "--denoiser explicitly or restore the data file.",
            DEMO_WEIGHTS,
        )
        return nsnet2.load(None, seed=seed)
    if spec == "random":
        return nsnet2.load(None, seed=seed)
    if spec == "demo":
        if not os.path.exists(DEMO_WEIGHTS):
            raise FileNotFoundError(
                f"packaged demo weights missing: {DEMO_WEIGHTS} "
                "(train replacements with apps.train)"
            )
        return nsnet2.load_npz(DEMO_WEIGHTS)
    if spec == "spectral_gate":
        return SpectralGateParams()
    if spec.startswith("spectral_gate:"):
        q, a, f = (float(x) for x in spec.split(":", 1)[1].split(","))
        return SpectralGateParams(quantile=q, alpha=a, floor=f)
    return nsnet2.load(spec, seed=seed)
