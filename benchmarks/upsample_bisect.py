"""Bisect the lerp-upsample cost; try exact-arithmetic layout variants."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from formula_vad_tpu.ops import resample

B, K = 21, 40
N16 = K * 8000  # 320000 per stream-channel
ITERS = 10


def timed(name, fn, inputs):
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*inputs[i % len(inputs)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:8.2f} ms")
    return dt


def upsample_2d(x, prev_last, rate):
    """Exact same arithmetic as resample.upsample, but all shifts happen on
    the sublane (row) axis of a [.., F, H] view instead of the flat lane axis."""
    H = 800  # row width at 16 kHz; any divisor of n with nice tiling
    n = x.shape[-1]
    assert n % H == 0
    f = n // H
    x2 = x.reshape(x.shape[:-1] + (f, H))
    # prev within a row = lane shift by one; row boundary element comes from
    # the previous row's last lane (sublane shift — cheap).
    row_last = x2[..., :, H - 1]  # [.., F]
    carry = jnp.concatenate([prev_last[..., None], row_last[..., :-1]], axis=-1)
    prev2 = jnp.concatenate([carry[..., None], x2[..., :-1]], axis=-1)
    fracs = jnp.asarray(np.arange(1, rate, dtype=np.float32) / np.float32(rate))
    interp = prev2[..., None] + (x2[..., None] - prev2[..., None]) * fracs
    groups = jnp.concatenate([interp, x2[..., None]], axis=-1)  # [.., F, H, rate]
    out = groups.reshape(x.shape[:-1] + (n * rate,))
    return out, x[..., -1]


def main():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((B * 2, N16)), jnp.float32) for _ in range(2)]
    prev = jnp.zeros((B * 2,), jnp.float32)

    timed("full upsample (current)",
          jax.jit(lambda x: resample.upsample(x, prev, 3)[0]), [(x,) for x in xs])

    # (i) prev concat only
    timed("prev shift-concat only",
          jax.jit(lambda x: jnp.concatenate([prev[..., None], x[..., :-1]], -1) * 2.0),
          [(x,) for x in xs])

    # (ii) interp + groups concat, skipping final reshape (keep [.., n, 3])
    def no_reshape(x):
        p = jnp.concatenate([prev[..., None], x[..., :-1]], -1)
        fr = jnp.asarray(np.arange(1, 3, dtype=np.float32) / 3.0)
        interp = p[..., :, None] + (x[..., :, None] - p[..., :, None]) * fr
        return jnp.concatenate([interp, x[..., :, None]], -1)
    timed("interp+concat, no final reshape", jax.jit(no_reshape), [(x,) for x in xs])

    # (iii) final reshape only
    g = jax.jit(no_reshape)(xs[0])
    timed("final [..,n,3]->[3n] reshape only",
          jax.jit(lambda gg: gg.reshape(B * 2, N16 * 3) * 2.0), [(g,), (g * 1.01,)])

    # 2D-row variant, exactness check
    ref = jax.jit(lambda x: resample.upsample(x, prev, 3)[0])(xs[0])
    new = jax.jit(lambda x: upsample_2d(x, prev, 3)[0])(xs[0])
    print("2d-variant max|diff|:", float(jnp.max(jnp.abs(ref - new))))
    timed("upsample_2d (row-shift variant)",
          jax.jit(lambda x: upsample_2d(x, prev, 3)[0]), [(x,) for x in xs])


if __name__ == "__main__":
    main()
