"""Volume / level utilities.

Mirrors ``src/audio_utils.zig`` and ``src/AudioPipeline/BufferedVolumeAnalyzer.zig``:

* ``rms_volume``      — sqrt(mean(x^2)) in f32 (audio_utils.zig:14-24).
* ``norm_to_dbfs``    — 20*log10(x) (audio_utils.zig:6-12).
* ``volume_analysis`` — per-chunk min/max channel RMS and min/max ratio
                        (BufferedVolumeAnalyzer.zig:48-69): the stereo
                        channel-ratio cue — real speech appears at similar
                        level in both channels, engine noise does not.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_volume(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean(x * x, axis=axis))


def norm_to_dbfs(x: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(x)


def volume_analysis(chunk: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-chunk stereo volume analysis.

    Args:
      chunk: [..., n_channels, n_samples] original (pre-denoise) audio.
    Returns:
      (volume_ratio, vol_min, vol_max), each [...].

    Reference semantics (BufferedVolumeAnalyzer.zig:48-69): vol_min starts at 1
    and vol_max at 0 — i.e. min is additionally clamped to <= 1 — and
    ratio = vol_min / vol_max, or 0 when vol_max == 0.
    """
    vols = rms_volume(chunk, axis=-1)  # [..., n_channels]
    vol_min = jnp.minimum(jnp.min(vols, axis=-1), 1.0)
    vol_max = jnp.maximum(jnp.max(vols, axis=-1), 0.0)
    ratio = jnp.where(vol_max == 0.0, 0.0, vol_min / vol_max)
    return ratio, vol_min, vol_max
