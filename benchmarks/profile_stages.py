"""Stage-by-stage on-chip timing of the offline batched VAD path.

Times each component of process_batch_offline separately (distinct inputs
per iteration, interleaved A/B within one process — see
.claude/skills/verify/SKILL.md for the measurement gotchas) to locate the
next optimization target. Run on the real chip (no JAX_PLATFORMS override).

Numbers are comparable ONLY within one run: the tunnel hands some processes
a connection throttled up to ~19x for their whole lifetime (stable but
wrong absolutes), so never diff stage timings across runs — rerun the whole
profile and compare ratios.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from formula_vad_tpu.config import VADConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import stft
from formula_vad_tpu.pipeline import denoiser as den_mod
from formula_vad_tpu.pipeline import fsm_pallas, offline, vad

B = int(os.environ.get("BENCH_STREAMS", "21"))
K = int(os.environ.get("BENCH_CHUNKS", "40"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def _sync(out):
    """block_until_ready is a no-op through the axon relay; force completion
    with a device-side reduce + 4-byte fetch (see verify SKILL.md)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.max(jnp.abs(leaf.astype(jnp.float32))))


def timed(name, fn, inputs):
    out = fn(*inputs[0])  # warmup/compile
    _sync(out)

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(*inputs[i % len(inputs)])
        _sync(out)
        return time.perf_counter() - t0

    long_n = max(3, ITERS)
    short = min(max(2, long_n // 4), long_n - 1)
    dt = (run(long_n) - run(short)) / (long_n - short)  # slope: sync overhead cancels
    print(f"{name:34s} {dt*1e3:8.2f} ms")
    return dt


def main():
    params = nsnet2.load(None)
    st = vad.statics_from_config(VADConfig())
    T = K * st.chunk_size
    rng = np.random.default_rng(0)
    audios = [
        jnp.asarray(0.02 * rng.standard_normal((B, 2, T)), jnp.float32)
        for _ in range(2)
    ]
    n_valid = jnp.full((B,), K, jnp.int32)

    # --- full path ---
    full = jax.jit(
        lambda a: offline.process_batch_offline(params, st, a, use_pallas_fsm=True)[0].event
    )
    t_full = timed("full process_batch_offline", full, [(a,) for a in audios])

    # --- front-end: window inputs (everything but FSM) ---
    wi = jax.jit(
        lambda a: jax.vmap(lambda x, n: offline.window_inputs(params, st, x, n))(a, n_valid)
    )
    t_wi = timed("window_inputs (front-end)", wi, [(a,) for a in audios])

    # --- stage 1: fused decimate+window+rDFT ---
    def seg(a):
        flat = a.reshape(B * 2, T)
        re, im = stft.stft_segmat(
            flat, den_mod._WINDOW, 320, decimate=3,
            initial_segment=jnp.zeros((B * 2, 480), jnp.float32),
        )
        return re, im
    segf = jax.jit(seg)
    t_seg = timed("stft_segmat (decimate+rDFT)", segf, [(a,) for a in audios])

    re, im = segf(audios[0])
    feats = jax.jit(lambda r, i: den_mod.compute_features(r, i))(re, im)
    jax.block_until_ready(feats)

    # --- stage 2: GRU/model apply over [N, 54, 161] ---
    n_rows = B * 2 * K
    feats_np = np.asarray(feats)
    model_ins = [
        jnp.asarray(
            np.repeat(feats_np[:, :54, :][:, None], K, 1).reshape(n_rows, 54, 161)
            + 0.01 * j,
            jnp.float32,
        )
        for j in range(2)
    ]
    t_gru = timed("nsnet2.apply (GRU stack)", jax.jit(lambda m: nsnet2.apply(params, m)), [(m,) for m in model_ins])

    # --- stage 3: iSTFT/OLA to 16 kHz (the scoring path stops here) ---
    def recon(r, i):
        return stft.istft_segmat(r, i, den_mod._WINDOW, 320)
    t_ola = timed("istft_segmat (to 16k)", jax.jit(recon), [(re, im), (re * 1.01, im)])

    # --- stage 4: fused 16k band volumes + chunk RMS glue ---
    c16 = jnp.zeros((B, 2, K * 8000), jnp.float32) + audios[0][..., : K * 8000] * 0.3
    nw = T // st.fft_size
    def band(d):
        band_v = stft.band_volume_16k(
            d, jnp.zeros(d.shape[:-1], jnp.float32), vad._hann(st.fft_size),
            st.fft_size, st.norm_factor, st.min_bin, st.max_bin, nw,
        )
        return jnp.min(band_v, axis=1)
    t_band = timed("band_volume_16k (fused)", jax.jit(band), [(c16,), (c16 * 1.01,)])

    # --- stage 5: FSM Pallas kernel ---
    nw = T // st.fft_size
    mv = jnp.abs(audios[0][:, 0, :nw]) * 0.01
    vr = jnp.ones((B, nw), jnp.float32) * 0.8
    va = jnp.ones((B, nw), bool)
    t_fsm = timed(
        "fsm pallas scan_windows",
        jax.jit(lambda m, r, v: fsm_pallas.scan_windows_pallas(st.fsm_shape, st.fsm_params, m, r, v).event),
        [(mv, vr, va), (mv * 1.01, vr, va)],
    )

    audio_sec = B * K * 0.5
    print(f"\naudio processed per call: {audio_sec:.0f} s")
    print(f"sum of stages: {(t_seg+t_gru+t_ola+t_band+t_fsm)*1e3:.2f} ms  vs full {t_full*1e3:.2f} ms")
    print(f"unaccounted (model_in assembly, feats, RMS, valid logic): {(t_wi-t_seg-t_gru-t_ola-t_band)*1e3:.2f} ms")
    print(f"realtime factor (full): {audio_sec/t_full:.0f}x")


if __name__ == "__main__":
    main()
