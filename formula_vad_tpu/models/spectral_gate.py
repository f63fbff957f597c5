"""Classical spectral-gate denoiser — a weights-free alternative model family.

The reference ships exactly one denoiser (the NSNet2 ONNX blob, which is an
absent LFS object upstream). This module provides a second, self-contained
gain model with the same interface contract as NSNet2 — a per-frame spectral
gain mask over the same 161-bin 20 ms STFT — so the rest of the pipeline
(chunking, OLA, VAD) is shared unchanged:

* noise PSD is estimated per 0.5 s chunk as a low quantile of the frame
  powers per bin (stateless per chunk, like the reference's per-chunk ONNX
  runs — so the chunk-parallel offline path applies verbatim);
* the gain is an over-subtracted Wiener mask with a floor:
      g = clip(1 - alpha * noise / power, floor, 1).

Select it with ``--denoiser spectral_gate`` (apps) or
``models.registry.load_denoiser("spectral_gate")``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SpectralGateParams:
    """Gain-model parameters. ``quantile`` picks the noise-floor estimate;
    ``alpha`` is the over-subtraction factor; ``floor`` the minimum gain."""

    quantile: float = 0.10
    alpha: float = 1.5
    floor: float = 0.1

    def apply_gains(self, features: jnp.ndarray) -> jnp.ndarray:
        """log10-power features [..., T, 161] -> gains [..., T, 161]."""
        power = jnp.power(10.0, features)
        noise = jnp.quantile(power, self.quantile, axis=-2, keepdims=True)
        gain = 1.0 - np.float32(self.alpha) * noise / jnp.maximum(power, 1e-12)
        return jnp.clip(gain, np.float32(self.floor), 1.0)


jax.tree_util.register_dataclass(
    SpectralGateParams, data_fields=[], meta_fields=["quantile", "alpha", "floor"]
)
