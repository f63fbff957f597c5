"""Layout experiment: where do the segment-product's remaining ms go?

After the predecim split the bare batched `segmat_prod` measures ~1.5 ms at
bf16_io vs a ~0.15 ms MXU floor + ~0.6 ms HBM floor — the gap is layout
(644 output lanes pad to 768; K=160 pads to 256) and/or scheduling. This
measures isolated variants of the same contraction, interleaved in one
process, to find which knob matters:

  dense      — the shipping predecim form: sel[480,160] then basis[160,644]
  fused      — the pre-predecim zero-stuffed basis [480,644] (baseline)
  pad768     — predecim with the basis explicitly zero-padded to N=768
               (does hand-padding beat XLA's implicit pad?)
  split2     — predecim emitting two [.., 322] products (re|im × top|bot
               regrouped): N=322 pads to 384 per matmul — less pad waste
               than one 644→768, at the cost of two outputs
  transposed — prod^T = basis^T @ segs^T: output [644, rows] puts the long
               axis on lanes

Numbers inform whether a production change (or a Pallas fused kernel) has
headroom; decisions stay with the shipping predecim form unless a variant
wins big AND survives an exactness story.

Run on chip:  python benchmarks/stft_layout_exp.py   (BENCH_MODES=all for 3 modes)
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
from formula_vad_tpu.ops import stft, precision
from formula_vad_tpu.pipeline import denoiser as den_mod
from formula_vad_tpu.pipeline import vad

N_STREAMS = int(os.environ.get("BENCH_STREAMS", "21"))
N_CHUNKS = int(os.environ.get("BENCH_CHUNKS", "40"))
N_ITERS = int(os.environ.get("AB_ITERS", "12"))
REPS = 3


def variants(st):
    from formula_vad_tpu.ops.precision import io_cast, matmul_precision

    hop = NSNET2_N_FFT // 2
    d = st.downsample_rate
    sel = stft.decim_sel_arr(hop, d)
    dense = stft.segmat_basis_arr(den_mod._WINDOW, NSNET2_N_FFT, 1)  # [160, 644]
    fused = stft.segmat_basis_arr(den_mod._WINDOW, NSNET2_N_FFT, d)  # [480, 644]
    n = dense.shape[1]
    pad768 = jnp.concatenate(
        [dense, jnp.zeros((hop, 768 - n), dense.dtype)], axis=1
    )

    def prep(audio):
        t = audio.shape[-1]
        return audio.reshape(audio.shape[:-1] + (t // (hop * d), hop * d))

    def f_dense(audio):
        p = matmul_precision()
        s16 = jnp.matmul(io_cast(prep(audio)), io_cast(sel), precision=p)
        return jnp.matmul(io_cast(s16), io_cast(dense), precision=p)

    def f_fused(audio):
        return jnp.matmul(
            io_cast(prep(audio)), io_cast(fused), precision=matmul_precision()
        )

    def f_pad768(audio):
        p = matmul_precision()
        s16 = jnp.matmul(io_cast(prep(audio)), io_cast(sel), precision=p)
        return jnp.matmul(io_cast(s16), io_cast(pad768), precision=p)

    def f_split2(audio):
        p = matmul_precision()
        s16 = jnp.matmul(io_cast(prep(audio)), io_cast(sel), precision=p)
        a = jnp.matmul(io_cast(s16), io_cast(dense[:, : n // 2]), precision=p)
        b = jnp.matmul(io_cast(s16), io_cast(dense[:, n // 2 :]), precision=p)
        return a, b

    def f_transposed(audio):
        p = matmul_precision()
        s16 = jnp.matmul(io_cast(prep(audio)), io_cast(sel), precision=p)
        # [644, 160] @ [160, rows] with the segment axis flattened to lanes
        lead = s16.shape[:-2]
        rows = int(np.prod(lead)) * s16.shape[-2]
        flat = s16.reshape(rows, s16.shape[-1]).T  # [160, rows]
        return jnp.matmul(io_cast(dense.T), io_cast(flat), precision=p)

    return {
        "dense": f_dense,
        "fused": f_fused,
        "pad768": f_pad768,
        "split2": f_split2,
        "transposed": f_transposed,
    }


def slope_time(fn, audios, n_long):
    def probe(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return jnp.max(jnp.abs(leaf.astype(jnp.float32)))

    out = fn(audios[0])
    float(probe(out))

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(audios[i % 2])
        float(probe(out))
        return time.perf_counter() - t0

    return slope_from_run(run, n_long)


def main():
    st = vad.statics_from_config(VADConfig())
    mode_list = [("bf16_io", "default", "bf16")]
    if os.environ.get("BENCH_MODES") == "all":
        mode_list = [
            ("highest", "highest", "f32"),
            ("bf16", "default", "f32"),
            ("bf16_io", "default", "bf16"),
        ]
    gen = jax.jit(
        lambda key: 0.02
        * jax.random.normal(
            key, (N_STREAMS, st.n_channels, N_CHUNKS * st.chunk_size), jnp.float32
        )
    )
    audios = [gen(jax.random.PRNGKey(i)) for i in range(2)]

    for mode_name, level, io in mode_list:
        precision.set_matmul_precision(level)
        precision.set_io_dtype(io)
        fns = {k: jax.jit(v) for k, v in variants(st).items()}
        print(f"== mode={mode_name} ==", flush=True)
        results = {}
        for rep in range(REPS):
            for name, fn in fns.items():
                dt = slope_time(fn, audios, N_ITERS)
                results.setdefault(name, []).append(dt)
                print(f"  rep{rep} {name:11s} {dt*1e3:7.2f} ms", flush=True)
        mins = {k: min(v) for k, v in results.items()}
        print(
            "  => " + "  ".join(f"{k} {v*1e3:.2f}" for k, v in mins.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
