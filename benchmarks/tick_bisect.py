"""Bisect the online chunk_step cost at B=1024 (one process, real chip).

Round-2 finding (ROOFLINE.md "online tick"): the tick was dominated not by
the FSM but by the window accumulator's traced-index gather, since replaced
by a dynamic-slice. acc_dynfill vs acc_staticfill isolates what framing
dynamism still costs; denoise is the expected post-fix bound.

Run from the repo root:  python benchmarks/tick_bisect.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup  # noqa: E402

bench_setup()
import jax, jax.numpy as jnp, numpy as np
from formula_vad_tpu.config import VADConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import stft, volume
from formula_vad_tpu.pipeline import denoiser, vad

B = int(os.environ.get("TB_B", "1024"))
params = nsnet2.load(None)
st = vad.statics_from_config(VADConfig())

def sync(x):
    float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32))))

rng = np.random.default_rng(0)
chunks = [jnp.asarray(0.02*rng.standard_normal((B, 2, st.chunk_size)), jnp.float32)
          for _ in range(2)]
den_c = jax.vmap(lambda _: denoiser.init_carry(st.n_channels))(jnp.arange(B))
full_c = jax.vmap(lambda _: vad.init_carry(st))(jnp.arange(B))
fills = jnp.asarray(rng.integers(0, st.fft_size, (B,)), jnp.int32)

f_den = jax.jit(lambda c, a: jax.vmap(lambda cc, aa: denoiser.denoise_chunk(params, cc, aa))(c, a))

def make_den_wavefront():
    # FVAD_GRU_WAVEFRONT halves the GRU serial chain (layer-2 step t runs
    # beside layer-1 step t+1) and measured FASTER in the B=1 online regime
    # (0.84 vs 1.09 ms, round 1); whether it still wins at the B=1024
    # serving tick decides whether OnlineBatchServer should default to it.
    # The env var is read at TRACE time: pin it around every call (the
    # first one traces).
    jf = jax.jit(lambda c, a: jax.vmap(
        lambda cc, aa: denoiser.denoise_chunk(params, cc, aa))(c, a))
    def call(c, a):
        old = os.environ.get("FVAD_GRU_WAVEFRONT")
        os.environ["FVAD_GRU_WAVEFRONT"] = "on"
        try:
            return jf(c, a)
        finally:
            if old is None:
                os.environ.pop("FVAD_GRU_WAVEFRONT", None)
            else:
                os.environ["FVAD_GRU_WAVEFRONT"] = old
    return call

# TB_WAVEFRONT=0 skips the wavefront variant: its second full program's
# workspace is what pushed the dense-B bisect (TB_B=13824) over HBM, and
# the wavefront verdict is already settled at serving shapes (a measured
# dead end — ROOFLINE.md); the dense bisect only needs the stage split.
WAVEFRONT = os.environ.get("TB_WAVEFRONT", "1") != "0"
f_den_wf = make_den_wavefront() if WAVEFRONT else None

def acc_band(carry, denoised):
    new_buf, new_fill, frames, n_windows, win_indices, valid = vad._accumulate_windows(
        st, carry, denoised)
    mags = stft.magnitude_windows(frames, vad._hann(st.fft_size), st.fft_size, st.norm_factor)
    band = jnp.sum(mags[..., st.min_bin:st.max_bin+1], axis=-1)
    return jnp.min(band, axis=0), new_buf, new_fill

f_acc = jax.jit(lambda buf, fill, d: jax.vmap(
    lambda b_, f_, d_: acc_band({"fft_buf": b_, "fft_fill": f_, "win_base": jnp.int32(0)}, d_))(buf, fill, d))

# static-fill variant: fill=0 baked in
def acc_band0(buf, denoised):
    ext = jnp.concatenate([buf, denoised], axis=-1)
    # fill=0 baked in: the chunk yields floor(chunk/fft) complete windows
    # (one fewer than max_windows — this is a cost isolation probe, not the
    # production framing).
    n0 = st.chunk_size // st.fft_size
    frames = ext[:, st.fft_size:st.fft_size + n0 * st.fft_size].reshape(2, n0, st.fft_size)
    mags = stft.magnitude_windows(frames, vad._hann(st.fft_size), st.fft_size, st.norm_factor)
    band = jnp.sum(mags[..., st.min_bin:st.max_bin+1], axis=-1)
    return jnp.min(band, axis=0)

f_acc0 = jax.jit(lambda buf, d: jax.vmap(acc_band0)(buf, d))

f_vol = jax.jit(lambda a: jax.vmap(volume.volume_analysis)(a))

buf0 = jnp.zeros((B, 2, st.fft_size), jnp.float32)

def timed(f, args_list, n):
    t0 = time.perf_counter()
    for i in range(n):
        out = f(*args_list[i % 2])
    sync(out)
    return time.perf_counter() - t0

den_out = f_den(den_c, chunks[0]); sync(den_out); print("den compiled", flush=True)
if WAVEFRONT:
    sync(f_den_wf(den_c, chunks[0])); print("den_wf compiled", flush=True)
d48 = [den_out[1], f_den(den_c, chunks[1])[1]]
sync(f_acc(buf0, fills, d48[0])); print("acc compiled", flush=True)
sync(f_acc0(buf0, d48[0])); print("acc0 compiled", flush=True)
sync(f_vol(chunks[0])); print("vol compiled", flush=True)

for rep in range(3):
    t_d = (timed(f_den, [(den_c, chunks[0]), (den_c, chunks[1])], 8) - timed(f_den, [(den_c, chunks[0]), (den_c, chunks[1])], 2)) / 6 * 1e3
    t_dw = (
        (timed(f_den_wf, [(den_c, chunks[0]), (den_c, chunks[1])], 8)
         - timed(f_den_wf, [(den_c, chunks[0]), (den_c, chunks[1])], 2)) / 6 * 1e3
    ) if WAVEFRONT else float("nan")
    t_a = (timed(f_acc, [(buf0, fills, d48[0]), (buf0, fills, d48[1])], 8) - timed(f_acc, [(buf0, fills, d48[0]), (buf0, fills, d48[1])], 2)) / 6 * 1e3
    t_a0 = (timed(f_acc0, [(buf0, d48[0]), (buf0, d48[1])], 8) - timed(f_acc0, [(buf0, d48[0]), (buf0, d48[1])], 2)) / 6 * 1e3
    t_v = (timed(f_vol, [(chunks[0],), (chunks[1],)], 8) - timed(f_vol, [(chunks[0],), (chunks[1],)], 2)) / 6 * 1e3
    print(f"rep{rep} denoise={t_d:.1f} ms  denoise_wavefront={t_dw:.1f} ms  acc_dynfill={t_a:.1f} ms  acc_staticfill={t_a0:.1f} ms  volume={t_v:.1f} ms", flush=True)
