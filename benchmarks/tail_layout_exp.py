"""Lane-alignment experiment on the scoring tail + FF head matmuls.

`stft_layout_exp.py` found that EXPLICITLY zero-padding a misaligned
matmul's N to the next 128-lane multiple beats XLA's implicit pad by ~22%
on the predecim STFT basis (shipped: `stft.segmat_basis_padded_arr`).
This asks the same question of the remaining misaligned contractions of
the offline step, each at its production shape, interleaved in one
process:

  istft  — z[.., F, 322] @ inv[322, 320]   (K 322->384, N 320->384)
      plain    — the shipping `istft_segmat` core
      npad     — inv N-padded to 384 zero cols, slice [..., :320].
                 Bitwise-expected (output cols independent).
      knpad    — + z/inv K-padded to 384 (zero lanes x zero rows).
                 Same-tiling-expected vs XLA's implicit K pad.
  band   — main[.., nsw, 1024] @ basis[1024, 198]   (N 198->256)
      plain    — the shipping `band_volume_16k` core matmul
      npad     — basis N-padded to 256, slice [..., :198]. Bitwise-expected.
  head   — [R, 50, 400] @ ff1[400,600] -> relu -> @ ff2[600,600] -> relu
           -> @ out[600,161] -> sigmoid   (N 600->640 twice, 161->192)
      plain    — the shipping head
      npad     — ff1/ff2 N-padded 640 (zero cols+bias -> relu keeps pad
                 lanes 0), ff2/out K zero-rows explicit (same tiles as
                 XLA's implicit pad), out N-padded 192, slice [..., :161].

Decision rule: a variant must win >=5% in >=2 of 3 reps AND pass its
exactness gate before production wiring (then a full-step A/B decides).

Run on chip:  python benchmarks/tail_layout_exp.py   (BENCH_MODES=all for 3 modes)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup, slope_from_run  # noqa: E402

bench_setup()

import jax
import jax.numpy as jnp
import numpy as np

from formula_vad_tpu.config import VADConfig, NSNET2_N_FFT
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import precision, stft
from formula_vad_tpu.ops.precision import io_cast, matmul_precision
from formula_vad_tpu.pipeline import denoiser as den_mod
from formula_vad_tpu.pipeline import vad

N_STREAMS = int(os.environ.get("BENCH_STREAMS", "21"))
N_CHUNKS = int(os.environ.get("BENCH_CHUNKS", "40"))
N_ITERS = int(os.environ.get("AB_ITERS", "12"))
REPS = 3
OUT_FRAMES = 50


def _npad_cols(w, width):
    w = np.asarray(w)
    return jnp.asarray(
        np.concatenate([w, np.zeros((w.shape[0], width - w.shape[1]), w.dtype)], axis=1)
    )


def _npad_vec(b, width):
    b = np.asarray(b)
    return jnp.asarray(np.concatenate([b, np.zeros((width - b.shape[0],), b.dtype)]))


def _kpad_rows(w, rows):
    w = np.asarray(w)
    return jnp.asarray(
        np.concatenate([w, np.zeros((rows - w.shape[0], w.shape[1]), w.dtype)])
    )


def istft_variants():
    n_bins = NSNET2_N_FFT // 2 + 1  # 161
    key = hash(den_mod._WINDOW.tobytes())
    stft._SEGMAT_WINDOWS[key] = np.asarray(den_mod._WINDOW, np.float32)
    inv = stft._inv_segmat_basis(key, NSNET2_N_FFT)  # [322, 320]
    inv_n = _npad_cols(inv, 384)  # [322, 384]
    inv_kn = _kpad_rows(np.asarray(inv_n), 384)  # [384, 384]
    inv = jnp.asarray(inv)

    def f_plain(z):
        return jnp.matmul(io_cast(z), io_cast(inv), precision=matmul_precision())

    def f_npad(z):
        p = jnp.matmul(io_cast(z), io_cast(inv_n), precision=matmul_precision())
        return p[..., : NSNET2_N_FFT]

    def f_knpad(z):
        zc = io_cast(z)
        zp = jnp.concatenate(
            [zc, jnp.zeros(z.shape[:-1] + (384 - 2 * n_bins,), zc.dtype)], axis=-1
        )
        p = jnp.matmul(zp, io_cast(inv_kn), precision=matmul_precision())
        return p[..., : NSNET2_N_FFT]

    return {"plain": f_plain, "npad": f_npad, "knpad": f_knpad}


def band_variants(st):
    # Production band basis at the VAD analysis window (1024) over the
    # 16 kHz stream with the lerp fold; basis[0] (prev-sample row) enters as
    # a rank-1 term and is layout-neutral — measure the main contraction.
    win = np.asarray(vad._hann(st.fft_size), np.float32)
    wkey = hash(win.tobytes())
    stft._SEGMAT_WINDOWS[wkey] = win
    basis = stft._band16_basis(
        wkey, st.fft_size, st.min_bin, st.max_bin, st.downsample_rate
    )[1:]
    # [1024, 198]
    basis_n = _npad_cols(basis, 256)
    basis = jnp.asarray(basis)
    n = basis.shape[1]

    def f_plain(main):
        return jnp.matmul(io_cast(main), io_cast(basis), precision=matmul_precision())

    def f_npad(main):
        p = jnp.matmul(io_cast(main), io_cast(basis_n), precision=matmul_precision())
        return p[..., :n]

    return {"plain": f_plain, "npad": f_npad}


def head_variants(params):
    p = params
    plain_w = (p.ff1_w, p.ff1_b, p.ff2_w, p.ff2_b, p.out_w, p.out_b)
    ff1_wp = _npad_cols(p.ff1_w, 640)
    ff1_bp = _npad_vec(p.ff1_b, 640)
    ff2_wp = _npad_cols(np.asarray(_kpad_rows(p.ff2_w, 640)), 640)
    ff2_bp = _npad_vec(p.ff2_b, 640)
    out_wp = _npad_cols(np.asarray(_kpad_rows(p.out_w, 640)), 192)
    out_bp = _npad_vec(p.out_b, 192)
    pad_w = (ff1_wp, ff1_bp, ff2_wp, ff2_bp, out_wp, out_bp)

    def run(y, weights, n_out):
        f1w, f1b, f2w, f2b, ow, ob = [io_cast(w) for w in weights]
        pr = matmul_precision()
        y = jax.nn.relu(jnp.matmul(io_cast(y), f1w, precision=pr) + f1b)
        y = jax.nn.relu(jnp.matmul(y, f2w, precision=pr) + f2b)
        return jax.nn.sigmoid(jnp.matmul(y, ow, precision=pr) + ob)[..., :n_out]

    nb = nsnet2.N_BINS

    def f_plain(y):
        return run(y, plain_w, nb)

    def f_npad(y):
        return run(y, pad_w, nb)

    return {"plain": f_plain, "npad": f_npad}


def slope_time(fn, xs, n_long):
    def probe(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return jnp.max(jnp.abs(leaf.astype(jnp.float32)))

    float(probe(fn(xs[0])))

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(xs[i % 2])
        float(probe(out))
        return time.perf_counter() - t0

    return slope_from_run(run, n_long)


def main():
    st = vad.statics_from_config(VADConfig())
    params = nsnet2.init_params(jax.random.PRNGKey(0))
    mode_list = [("bf16_io", "default", "bf16")]
    if os.environ.get("BENCH_MODES") == "all":
        mode_list = [
            ("highest", "highest", "f32"),
            ("bf16", "default", "f32"),
            ("bf16_io", "default", "bf16"),
        ]

    # Production shapes for one bench slab (21 streams x 2 ch x 40 chunks).
    n_bins = NSNET2_N_FFT // 2 + 1
    t16 = N_CHUNKS * 8000
    n_frames = t16 // (NSNET2_N_FFT // 2)
    nsw = -(-(t16 * st.downsample_rate // st.fft_size) // st.downsample_rate)
    shapes = {
        "istft": (N_STREAMS, 2, n_frames, 2 * n_bins),
        "band": (N_STREAMS, 2, nsw, st.fft_size),
        "head": (N_STREAMS * 2 * N_CHUNKS, OUT_FRAMES, nsnet2.HIDDEN),
    }
    gens = {
        k: jax.jit(
            lambda key, s=s: 0.05 * jax.random.normal(key, s, jnp.float32)
        )
        for k, s in shapes.items()
    }
    inputs = {
        k: [g(jax.random.PRNGKey(7 * i + j)) for j in range(2)]
        for i, (k, g) in enumerate(gens.items())
    }

    stages = {
        "istft": istft_variants(),
        "band": band_variants(st),
        "head": head_variants(params),
    }

    for mode_name, level, io in mode_list:
        precision.set_matmul_precision(level)
        precision.set_io_dtype(io)
        print(f"== mode={mode_name} ==", flush=True)
        for stage, makers in stages.items():
            fns = {k: jax.jit(v) for k, v in makers.items()}
            xs = inputs[stage]
            ref = fns["plain"](xs[0])
            for name, fn in fns.items():
                if name == "plain":
                    continue
                d = float(
                    jnp.max(
                        jnp.abs(
                            fn(xs[0]).astype(jnp.float32) - ref.astype(jnp.float32)
                        )
                    )
                )
                print(f"  gate {stage}/{name:6s} max|d| = {d:.3e}", flush=True)
            results = {}
            for rep in range(REPS):
                for name, fn in fns.items():
                    dt = slope_time(fn, xs, N_ITERS)
                    results.setdefault(name, []).append(dt)
                    print(
                        f"  rep{rep} {stage}/{name:6s} {dt*1e3:7.3f} ms", flush=True
                    )
            mins = {k: min(v) for k, v in results.items()}
            print(
                f"  => {stage}: "
                + "  ".join(f"{k} {v*1e3:.3f}" for k, v in mins.items()),
                flush=True,
            )


if __name__ == "__main__":
    main()
