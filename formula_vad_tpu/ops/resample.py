"""Integer-ratio resampling with the reference's exact semantics.

Mirrors ``src/audio_utils/resample.zig``:

* ``downsample`` — naive decimation, out[i] = in[i * rate] (resample.zig:9-29).
  No anti-alias filter, by design (parity with the reference).
* ``upsample``   — linear interpolation with a carried last sample
  (resample.zig:32-65): for rate R the output is
  ``[lerp(prev, x0, 1/R), ..., lerp(prev, x0, (R-1)/R), x0, lerp(x0, x1, 1/R), ...]``
  i.e. each input sample lands at output index ``i*R + (R-1)`` and the R-1
  slots before it interpolate from the previous sample.

Both are pure jnp functions shaped for batched use: they operate on the
trailing axis and broadcast over any leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def calc_downsample_rate(in_rate: int, base_rate: int) -> int:
    if in_rate % base_rate != 0:
        raise ValueError("sample rate must be divisible by base_rate (resample.zig:4-7)")
    return in_rate // base_rate


def downsample(x: jnp.ndarray, rate: int) -> jnp.ndarray:
    """Decimate the trailing axis by ``rate`` (out[i] = in[i*rate])."""
    if rate == 1:
        return x
    return x[..., ::rate]


def upsample(x: jnp.ndarray, prev_last: jnp.ndarray, rate: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lerp-upsample the trailing axis by ``rate`` with cross-chunk carry.

    Args:
      x: [..., n] input samples.
      prev_last: [...] the final input sample of the previous chunk (0 initially).
    Returns:
      (out [..., n*rate], new_last [...]).

    Matches resample.zig:32-65: ``frac = (j+1)/rate`` for the j-th interpolated
    slot, and the source sample itself is emitted at the end of each group.
    """
    if rate == 1:
        return x, x[..., -1]
    n = x.shape[-1]
    prev = jnp.concatenate([prev_last[..., None], x[..., :-1]], axis=-1)  # [..., n]
    # Group g spans output indices [g*rate, (g+1)*rate): R-1 lerps then x[g].
    fracs = (np.arange(1, rate, dtype=np.float32) / np.float32(rate))  # [rate-1]
    fracs = jnp.asarray(fracs)
    # lerp(a, b, t) = a + (b - a) * t  (std.math.lerp, f32)
    interp = prev[..., :, None] + (x[..., :, None] - prev[..., :, None]) * fracs  # [..., n, rate-1]
    groups = jnp.concatenate([interp, x[..., :, None]], axis=-1)  # [..., n, rate]
    out = groups.reshape(x.shape[:-1] + (n * rate,))
    return out, x[..., -1]
