"""On-chip experiments: GRU-stack scan restructurings for nsnet2.apply.

V0  — current implementation (hoisted gi1, 3 sequential matmuls per step).
V0u — V0 with scan unroll.
V3  — delay-pipelined dual layer: ONE batch-3 bmm per step
      (h1@wh1 | h2@wh2 | y1_prev@wi2), layer 2 lags one step. Bit-exact
      per dot product vs V0.
V3u — V3 with scan unroll.
VFF — V0 but ff/out layers on the needed 50 frames only (slice before ff).

Run on the real chip. Reports ms per call and max|diff| vs V0.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.models.nsnet2 import _dense, gru_cell_pre, gru_cell
from formula_vad_tpu.ops.precision import matmul_precision

B = int(os.environ.get("BENCH_STREAMS", "21"))
K = int(os.environ.get("BENCH_CHUNKS", "40"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
N = B * 2 * K
T = 54


def apply_v0(params, features, unroll=1):
    x = _dense(features, params.fc_in_w, params.fc_in_b)
    gi1 = _dense(x, params.gru1.wi, params.gru1.bi)
    gi1_t = jnp.moveaxis(gi1, -2, 0)
    zero = jnp.zeros(features.shape[:-2] + (400,), features.dtype)

    def step(carry, gi1_t):
        h1, h2 = carry
        h1 = gru_cell_pre(params.gru1, h1, gi1_t)
        h2 = gru_cell(params.gru2, h2, h1)
        return (h1, h2), h2

    _, ys = jax.lax.scan(step, (zero, zero), gi1_t, unroll=unroll)
    y = jnp.moveaxis(ys, 0, -2)
    y = jax.nn.relu(_dense(y, params.ff1_w, params.ff1_b))
    y = jax.nn.relu(_dense(y, params.ff2_w, params.ff2_b))
    return jax.nn.sigmoid(_dense(y, params.out_w, params.out_b))


def apply_v3(params, features, unroll=1):
    """Delay-pipelined: one [3, N, 400] @ [3, 400, 1200] bmm per step."""
    x = _dense(features, params.fc_in_w, params.fc_in_b)
    gi1 = _dense(x, params.gru1.wi, params.gru1.bi)
    gi1_t = jnp.moveaxis(gi1, -2, 0)  # [T, ..., 1200]
    # one trailing dummy step for the drain iteration
    gi1_t = jnp.concatenate([gi1_t, jnp.zeros_like(gi1_t[:1])], 0)
    zero = jnp.zeros(features.shape[:-2] + (400,), features.dtype)

    w3 = jnp.stack([params.gru1.wh, params.gru2.wh, params.gru2.wi])  # [3,400,1200]
    prec = matmul_precision()
    g1 = params.gru1
    g2 = params.gru2

    def step(carry, inp):
        gi1_i, i = inp
        h1, h2, y1_prev = carry
        lhs = jnp.stack(
            [h1, h2, y1_prev]
        )  # [3, ..., 400]
        g = jnp.einsum("k...i,kij->k...j", lhs, w3, precision=prec)
        gh1 = g[0] + g1.bh
        gh2 = g[1] + g2.bh
        gi2 = g[2] + g2.bi

        # layer 1 (frames 0..T-1; frozen on the drain step)
        z_i, r_i, n_i = jnp.split(gi1_i, 3, -1)
        z_h, r_h, n_h = jnp.split(gh1, 3, -1)
        z = jax.nn.sigmoid(z_i + z_h)
        r = jax.nn.sigmoid(r_i + r_h)
        n = jnp.tanh(n_i + r * n_h)
        h1n = (1.0 - z) * n + z * h1
        h1n = jnp.where(i < T, h1n, h1)

        # layer 2 (lags one step; inert on the prime step)
        z_i2, r_i2, n_i2 = jnp.split(gi2, 3, -1)
        z_h2, r_h2, n_h2 = jnp.split(gh2, 3, -1)
        z2 = jax.nn.sigmoid(z_i2 + z_h2)
        r2 = jax.nn.sigmoid(r_i2 + r_h2)
        n2 = jnp.tanh(n_i2 + r2 * n_h2)
        h2n = (1.0 - z2) * n2 + z2 * h2
        h2n = jnp.where(i > 0, h2n, h2)

        return (h1n, h2n, h1n), h2n

    idx = jnp.arange(T + 1, dtype=jnp.int32)
    _, ys = jax.lax.scan(step, (zero, zero, zero), (gi1_t, idx), unroll=unroll)
    y = jnp.moveaxis(ys[1:], 0, -2)
    y = jax.nn.relu(_dense(y, params.ff1_w, params.ff1_b))
    y = jax.nn.relu(_dense(y, params.ff2_w, params.ff2_b))
    return jax.nn.sigmoid(_dense(y, params.out_w, params.out_b))


def apply_vff(params, features):
    """V0 with ff/out applied only to the last 50 frames."""
    x = _dense(features, params.fc_in_w, params.fc_in_b)
    gi1 = _dense(x, params.gru1.wi, params.gru1.bi)
    gi1_t = jnp.moveaxis(gi1, -2, 0)
    zero = jnp.zeros(features.shape[:-2] + (400,), features.dtype)

    def step(carry, gi1_t):
        h1, h2 = carry
        h1 = gru_cell_pre(params.gru1, h1, gi1_t)
        h2 = gru_cell(params.gru2, h2, h1)
        return (h1, h2), h2

    _, ys = jax.lax.scan(step, (zero, zero), gi1_t)
    y = jnp.moveaxis(ys, 0, -2)[..., 4:, :]
    y = jax.nn.relu(_dense(y, params.ff1_w, params.ff1_b))
    y = jax.nn.relu(_dense(y, params.ff2_w, params.ff2_b))
    return jax.nn.sigmoid(_dense(y, params.out_w, params.out_b))


def timed(name, fn, inputs, ref=None):
    out = fn(inputs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(inputs[i % len(inputs)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    diff = ""
    if ref is not None:
        r = ref[..., -out.shape[-2]:, :] if out.shape != ref.shape else ref
        diff = f"  max|diff| vs V0 = {float(jnp.max(jnp.abs(out - r))):.3e}"
    print(f"{name:28s} {dt*1e3:8.2f} ms{diff}")
    return out, dt


def main():
    params = nsnet2.load(None)
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((N, T, 161)) - 6.0, jnp.float32)
        for _ in range(2)
    ]
    ref, t0 = timed("V0 baseline", jax.jit(lambda f: apply_v0(params, f)), feats)
    timed("V0u unroll=4", jax.jit(lambda f: apply_v0(params, f, unroll=4)), feats, ref)
    timed("V3 bmm delay-pipe", jax.jit(lambda f: apply_v3(params, f)), feats, ref)
    timed("V3u bmm unroll=4", jax.jit(lambda f: apply_v3(params, f, unroll=4)), feats, ref)
    timed("VFF ff-on-50", jax.jit(lambda f: apply_vff(params, f)), feats, ref)


if __name__ == "__main__":
    main()
