"""Bisect stft_segmat / istft_segmat cost on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from formula_vad_tpu.ops import stft, dft
from formula_vad_tpu.ops.precision import matmul_precision
from formula_vad_tpu.pipeline import denoiser as den_mod

B, K = 21, 40
T = K * 24000
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


def main():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((B * 2, T)), jnp.float32) for _ in range(2)]
    init = jnp.zeros((B * 2, 480), jnp.float32)

    timed("full stft_segmat (decimate=3)", jax.jit(
        lambda x: stft.stft_segmat(x, den_mod._WINDOW, 320, 3, init)[0]), [(x,) for x in xs])

    # concat + reshape only
    def shape_only(x):
        full = jnp.concatenate([init, x], -1)
        return full.reshape(B * 2, T // 480 + 1, 480) * 2.0
    timed("concat+reshape only", jax.jit(shape_only), [(x,) for x in xs])

    # matmul only (pre-shaped segs, zero-stuffed 480-row basis)
    key = hash(den_mod._WINDOW.tobytes())
    stft._SEGMAT_WINDOWS[key] = np.asarray(den_mod._WINDOW, np.float32)
    basis480 = jnp.asarray(stft._segmat_basis(key, 320, 3))
    segs = [shape_only(x) for x in xs]
    def mm480(s):
        return jnp.matmul(s, basis480, precision=matmul_precision())
    timed("matmul [*,2001,480]x[480,644]", jax.jit(mm480), [(s,) for s in segs])

    # decimate-first variant: strided slice then 160-row basis
    basis160 = jnp.asarray(np.ascontiguousarray(np.asarray(stft._segmat_basis(key, 320, 3))[0::3]))
    def dec_first(x):
        full = jnp.concatenate([init, x], -1)
        d = full.reshape(B * 2, (T + 480) // 3, 3)[..., 0]
        s = d.reshape(B * 2, T // 480 + 1, 160)
        prod = jnp.matmul(s, basis160, precision=matmul_precision())
        z = prod[..., :-1, : 2 * 161] + prod[..., 1:, 2 * 161 :]
        return z[..., :161], z[..., 161 : 2 * 161]
    out_ref = jax.jit(lambda x: stft.stft_segmat(x, den_mod._WINDOW, 320, 3, init))(xs[0])
    out_new = jax.jit(dec_first)(xs[0])
    d_re = float(jnp.max(jnp.abs(out_ref[0] - out_new[0])))
    d_im = float(jnp.max(jnp.abs(out_ref[1] - out_new[1])))
    print(f"decimate-first max|diff|: re {d_re:.3e} im {d_im:.3e}")
    timed("decimate-first stft (slice+160-row mm)", jax.jit(lambda x: dec_first(x)[0]), [(x,) for x in xs])

    # istft bisect
    re, im = out_ref
    def istft_full(r, i):
        return stft.istft_segmat(r, i, den_mod._WINDOW, 320)
    timed("full istft_segmat", jax.jit(istft_full), [(re, im), (re * 1.01, im)])

    inv = jnp.asarray(stft._inv_segmat_basis(key, 320))
    z = jnp.concatenate([re, im], -1)
    timed("istft matmul only [*,2000,322]x[322,320]",
          jax.jit(lambda zz: jnp.matmul(zz, inv, precision=matmul_precision())),
          [(z,), (z * 1.01,)])

    from formula_vad_tpu.ops import resample
    ola = jax.jit(istft_full)(re, im)
    timed("upsample x3 (lerp)",
          jax.jit(lambda o: resample.upsample(o[..., : K * 8000], jnp.zeros((B * 2,), jnp.float32), 3)[0]),
          [(ola,), (ola * 1.01,)])


if __name__ == "__main__":
    main()
