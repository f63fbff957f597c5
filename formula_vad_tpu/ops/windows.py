"""Window functions.

Semantics mirror the reference ``src/audio_utils/window_fn.zig``:

* ``hann_periodic``      — window_fn.zig:22-28 (cosine-sum with denominator N)
* ``hann_symmetric``     — window_fn.zig:30-41 (denominator N-1)
* ``hamming_periodic``   — window_fn.zig:43-49 (a0 = 0.53836)
* ``cosine_sum_periodic``— window_fn.zig:51-68
* ``window_norm_factor`` — window_fn.zig:8-16 (N / sum(w))
* ``sqrt_hann_symmetric``— the NSNet2 analysis/synthesis window
                           (src/NSNet2.zig:384-396: sqrt of symmetric Hann)

All windows are computed in float32, like the reference.
"""

from __future__ import annotations

import numpy as np


def cosine_sum_periodic(n: int, alphas) -> np.ndarray:
    idx = np.arange(n, dtype=np.float32)
    w = np.zeros(n, dtype=np.float32)
    for k, a in enumerate(alphas):
        w += np.float32((-1.0) ** k) * np.float32(a) * np.cos(
            (np.float32(2.0 * np.pi) * np.float32(k) * idx) / np.float32(n)
        ).astype(np.float32)
    return w.astype(np.float32)


def hann_periodic(n: int) -> np.ndarray:
    return cosine_sum_periodic(n, (0.5, 0.5))


def hann_symmetric(n: int) -> np.ndarray:
    idx = np.arange(n, dtype=np.float32)
    step = np.float32(2.0 * np.pi) / np.float32(n - 1)
    return (np.float32(0.5) - np.float32(0.5) * np.cos(idx * step)).astype(np.float32)


def hamming_periodic(n: int) -> np.ndarray:
    a0 = 0.53836
    return cosine_sum_periodic(n, (a0, 1.0 - a0))


def square(n: int) -> np.ndarray:
    return np.ones(n, dtype=np.float32)


def sqrt_hann_symmetric(n: int) -> np.ndarray:
    """NSNet2 analysis/synthesis window: sqrt(symmetric Hann) (NSNet2.zig:384-396)."""
    return np.sqrt(hann_symmetric(n)).astype(np.float32)


def window_norm_factor(window: np.ndarray) -> np.float32:
    """N / sum(w) (window_fn.zig:8-16), summed in float32 like the reference."""
    s = np.float32(0.0)
    # Sequential f32 accumulation matches the reference exactly; for the window
    # sizes used here (<= 1024) a vectorized f32 sum is within 1 ulp anyway.
    s = np.sum(window.astype(np.float32), dtype=np.float32)
    return np.float32(np.float32(len(window)) / s)
