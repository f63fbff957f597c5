"""Lane-alignment experiment on the NSNet2 GRU stack (the binding stage).

ROOFLINE.md: the GRU recurrence (~5.5 ms bf16) is the step's binding
resource, and the round-2 fused-kernel campaign's one transferable finding
was that the 400-wide gate slices are lane-UNALIGNED (400 != k*128 — inside
Pallas they forced whole-block lane rotations every step). The XLA scan
path does the same splits (`jnp.split(gh, 3)` at 400/800) and pads
K=400->512 / N=1200->1280 implicitly in every per-step matmul. The predecim
layout follow-up (`stft_layout_exp.py`) showed explicit zero-padding beats
XLA's implicit pad by ~22% on the stft matmul — this experiment asks
whether the same lever moves the full NSNet2 model stage at the bench
shape (1680 rows x T=54), interleaved in one process:

  plain    — the shipping apply() (baseline)
  split3   — per-gate recurrent matmuls (h @ wh_z|r|n as 3 [400,400] dots,
             outputs natively gate-aligned, no slicing anywhere; input
             projections likewise split outside the scan). Bitwise-expected
             vs plain (same K order per output column).
  whpad    — one recurrent matmul with each gate block zero-padded to 512
             cols ([400, 1536], gh slice starts 0/512/1024 lane-aligned,
             widths still 400). Bitwise-expected (zero cols, same K).
  kpad512  — everything carried 512-lane: fc_in N-padded 400->512, h
             carries 112 zero lanes, wi/wh K-padded 512 with zero rows,
             gates computed at full 512 width (pad lanes provably stay 0
             through the recurrence), ff1 K-padded. ~1-ulp reassociation
             class (zero K terms shift the MXU reduction grouping —
             PARITY.md deviation 13 class), exact-gated at a tolerance.

Decision rule: a variant must win >=5% on the full model stage in >=2 of 3
reps AND carry an exactness story before any production wiring.

Run on chip:  python benchmarks/gru_pad_exp.py     (BENCH_MODES=all for 3 modes)
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

from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import precision
from formula_vad_tpu.ops.precision import matmul_precision

ROWS = int(os.environ.get("BENCH_ROWS", "1680"))  # 21 streams x 2 ch x 40 chunks
T = int(os.environ.get("BENCH_T", "54"))
OUT_FRAMES = 50
N_ITERS = int(os.environ.get("AB_ITERS", "10"))
REPS = 3


def _dense(x, w, b):
    return jnp.matmul(x, w, precision=matmul_precision()) + b


def _pad_cols(w, b, width):
    """Zero-pad each of the 3 gate column blocks of (w [in, 3H], b [3H]) to
    ``width`` columns -> (w' [in, 3*width], b' [3*width])."""
    h = w.shape[1] // 3
    wz, wr, wn = np.split(np.asarray(w), 3, axis=1)
    bz, br, bn = np.split(np.asarray(b), 3)
    zc = np.zeros((w.shape[0], width - h), wz.dtype)
    zb = np.zeros((width - h,), bz.dtype)
    wp = np.concatenate([wz, zc, wr, zc, wn, zc], axis=1)
    bp = np.concatenate([bz, zb, br, zb, bn, zb])
    return jnp.asarray(wp), jnp.asarray(bp)


def _pad_rows(w, rows):
    w = np.asarray(w)
    return jnp.asarray(
        np.concatenate([w, np.zeros((rows - w.shape[0], w.shape[1]), w.dtype)])
    )


def _cast_tree(tree):
    from formula_vad_tpu.ops.precision import io_cast

    return jax.tree_util.tree_map(io_cast, tree)


def make_plain(params):
    def f(features):
        # Pin the FUSED [400, 1200] projections: since FVAD_GRU_SPLIT3=auto
        # shipped (default-on at default matmul precision), the shipping
        # apply() would otherwise BE split3 at this script's bf16/bf16_io
        # modes — making the plain-vs-split3 A/B vacuous on rerun and the
        # whpad/kpad512 deltas measured against the wrong baseline (same
        # vacuous-gate class as fe0458a).
        nsnet2.set_gru_split3("off")
        try:
            return nsnet2.apply(params, features, out_frames=OUT_FRAMES)
        finally:
            nsnet2.set_gru_split3(None)

    return f


def make_split3(params):
    """Per-gate matmuls; no 400-boundary slicing anywhere."""
    H = nsnet2.HIDDEN

    def split_w(g):
        wi = np.asarray(g.wi)
        wh = np.asarray(g.wh)
        bi = np.asarray(g.bi)
        bh = np.asarray(g.bh)
        return (
            tuple(jnp.asarray(a) for a in np.split(wi, 3, axis=1)),
            tuple(jnp.asarray(a) for a in np.split(wh, 3, axis=1)),
            tuple(jnp.asarray(a) for a in np.split(bi, 3)),
            tuple(jnp.asarray(a) for a in np.split(bh, 3)),
        )

    g1s, g2s = split_w(params.gru1), split_w(params.gru2)

    def gates(gi3, gh3, h):
        (zi, ri, ni), (zh, rh, nh) = gi3, gh3
        z = jax.nn.sigmoid(zi + zh)
        r = jax.nn.sigmoid(ri + rh)
        n = jnp.tanh(ni + r * nh)
        return (1.0 - z) * n + z * h

    def f(features):
        io = precision.io_dtype()
        p = params
        (wi1, wh1, bi1, bh1) = g1s
        (wi2, wh2, bi2, bh2) = g2s
        fc_w, fc_b = p.fc_in_w, p.fc_in_b
        head = (p.ff1_w, p.ff1_b, p.ff2_w, p.ff2_b, p.out_w, p.out_b)
        if io is not None:
            features = precision.io_cast(features)
            (wi1, wh1, bi1, bh1) = _cast_tree((wi1, wh1, bi1, bh1))
            (wi2, wh2, bi2, bh2) = _cast_tree((wi2, wh2, bi2, bh2))
            fc_w, fc_b = _cast_tree((fc_w, fc_b))
            head = _cast_tree(head)
        x = _dense(features, fc_w, fc_b)
        gi1 = tuple(_dense(x, w, b) for w, b in zip(wi1, bi1))
        gi1_t = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, -2, 0), gi1)
        zero = jnp.zeros(features.shape[:-2] + (H,), x.dtype)

        def step(carry, gi1_i):
            h1, h2 = carry
            gh1 = tuple(_dense(h1, w, b) for w, b in zip(wh1, bh1))
            h1 = gates(gi1_i, gh1, h1)
            gi2 = tuple(_dense(h1, w, b) for w, b in zip(wi2, bi2))
            gh2 = tuple(_dense(h2, w, b) for w, b in zip(wh2, bh2))
            h2 = gates(gi2, gh2, h2)
            return (h1, h2), h2

        _, ys = jax.lax.scan(step, (zero, zero), gi1_t)
        ys = ys[T - OUT_FRAMES :]
        y = jnp.moveaxis(ys, 0, -2)
        ff1_w, ff1_b, ff2_w, ff2_b, out_w, out_b = head
        y = jax.nn.relu(_dense(y, ff1_w, ff1_b))
        y = jax.nn.relu(_dense(y, ff2_w, ff2_b))
        return jax.nn.sigmoid(_dense(y, out_w, out_b))

    return f


def make_whpad(params):
    """Single gate matmuls with 512-wide gate blocks (aligned slice starts)."""
    H = nsnet2.HIDDEN
    W = 512

    def pad_g(g):
        wi, bi = _pad_cols(g.wi, g.bi, W)
        wh, bh = _pad_cols(g.wh, g.bh, W)
        return wi, wh, bi, bh

    g1p, g2p = pad_g(params.gru1), pad_g(params.gru2)

    def gates(gi, gh, h):
        zi, ri, ni = gi[..., :H], gi[..., W : W + H], gi[..., 2 * W : 2 * W + H]
        zh, rh, nh = gh[..., :H], gh[..., W : W + H], gh[..., 2 * W : 2 * W + H]
        z = jax.nn.sigmoid(zi + zh)
        r = jax.nn.sigmoid(ri + rh)
        n = jnp.tanh(ni + r * nh)
        return (1.0 - z) * n + z * h

    def f(features):
        io = precision.io_dtype()
        p = params
        (wi1, wh1, bi1, bh1) = g1p
        (wi2, wh2, bi2, bh2) = g2p
        fc_w, fc_b = p.fc_in_w, p.fc_in_b
        head = (p.ff1_w, p.ff1_b, p.ff2_w, p.ff2_b, p.out_w, p.out_b)
        if io is not None:
            features = precision.io_cast(features)
            (wi1, wh1, bi1, bh1) = _cast_tree((wi1, wh1, bi1, bh1))
            (wi2, wh2, bi2, bh2) = _cast_tree((wi2, wh2, bi2, bh2))
            fc_w, fc_b = _cast_tree((fc_w, fc_b))
            head = _cast_tree(head)
        x = _dense(features, fc_w, fc_b)
        gi1 = _dense(x, wi1, bi1)  # [..., T, 1536]
        gi1_t = jnp.moveaxis(gi1, -2, 0)
        zero = jnp.zeros(features.shape[:-2] + (H,), x.dtype)

        def step(carry, gi1_i):
            h1, h2 = carry
            h1 = gates(gi1_i, _dense(h1, wh1, bh1), h1)
            h2 = gates(_dense(h1, wi2, bi2), _dense(h2, wh2, bh2), h2)
            return (h1, h2), h2

        _, ys = jax.lax.scan(step, (zero, zero), gi1_t)
        ys = ys[T - OUT_FRAMES :]
        y = jnp.moveaxis(ys, 0, -2)
        ff1_w, ff1_b, ff2_w, ff2_b, out_w, out_b = head
        y = jax.nn.relu(_dense(y, ff1_w, ff1_b))
        y = jax.nn.relu(_dense(y, ff2_w, ff2_b))
        return jax.nn.sigmoid(_dense(y, out_w, out_b))

    return f


def make_kpad512(params):
    """Everything 512-lane: h carries 112 provably-zero lanes; all matmuls
    aligned in both K and (per gate block) N. Gates computed full-width —
    the pad lanes run sigmoid(0)/tanh(0) and stay exactly 0 through the
    recurrence ((1-z)*0 + z*0)."""
    H, W = nsnet2.HIDDEN, 512

    def prep():
        p = params
        # fc_in: N 400->512 (zero cols — pad lanes of x are exactly 0)
        fc_w = np.concatenate(
            [np.asarray(p.fc_in_w), np.zeros((nsnet2.N_BINS, W - H), np.float32)],
            axis=1,
        )
        fc_b = np.concatenate([np.asarray(p.fc_in_b), np.zeros((W - H,), np.float32)])

        def pad_g(g):
            wi, bi = _pad_cols(g.wi, g.bi, W)  # N-pad gates
            wh, bh = _pad_cols(g.wh, g.bh, W)
            wi = _pad_rows(wi, W)  # K-pad (input now 512 with zero lanes)
            wh = _pad_rows(wh, W)
            return wi, wh, bi, bh

        ff1_w = _pad_rows(params.ff1_w, W)  # K-pad the head entry
        return (
            jnp.asarray(fc_w),
            jnp.asarray(fc_b),
            pad_g(params.gru1),
            pad_g(params.gru2),
            ff1_w,
        )

    fc_w, fc_b, g1p, g2p, ff1_w = prep()

    def gates(gi, gh, h):
        # full 512-wide gate math; pad lanes: z=sig(0), r=sig(0), n=tanh(0)=0,
        # h'=(1-z)*0+z*h_pad — h_pad starts 0 and stays 0.
        z_i, r_i, n_i = jnp.split(gi, 3, axis=-1)
        z_h, r_h, n_h = jnp.split(gh, 3, axis=-1)
        z = jax.nn.sigmoid(z_i + z_h)
        r = jax.nn.sigmoid(r_i + r_h)
        n = jnp.tanh(n_i + r * n_h)
        return (1.0 - z) * n + z * h

    def f(features):
        io = precision.io_dtype()
        p = params
        (wi1, wh1, bi1, bh1) = g1p
        (wi2, wh2, bi2, bh2) = g2p
        fw, fb, f1w = fc_w, fc_b, ff1_w
        head = (p.ff1_b, p.ff2_w, p.ff2_b, p.out_w, p.out_b)
        if io is not None:
            features = precision.io_cast(features)
            (wi1, wh1, bi1, bh1) = _cast_tree((wi1, wh1, bi1, bh1))
            (wi2, wh2, bi2, bh2) = _cast_tree((wi2, wh2, bi2, bh2))
            fw, fb, f1w = _cast_tree((fw, fb, f1w))
            head = _cast_tree(head)
        x = _dense(features, fw, fb)  # [..., T, 512]
        gi1 = _dense(x, wi1, bi1)  # [..., T, 1536]
        gi1_t = jnp.moveaxis(gi1, -2, 0)
        zero = jnp.zeros(features.shape[:-2] + (W,), x.dtype)

        def step(carry, gi1_i):
            h1, h2 = carry
            h1 = gates(gi1_i, _dense(h1, wh1, bh1), h1)
            h2 = gates(_dense(h1, wi2, bi2), _dense(h2, wh2, bh2), h2)
            return (h1, h2), h2

        _, ys = jax.lax.scan(step, (zero, zero), gi1_t)
        ys = ys[T - OUT_FRAMES :]
        y = jnp.moveaxis(ys, 0, -2)  # [..., T_out, 512]
        ff1_b, ff2_w, ff2_b, out_w, out_b = head
        y = jax.nn.relu(_dense(y, f1w, ff1_b))
        y = jax.nn.relu(_dense(y, ff2_w, ff2_b))
        return jax.nn.sigmoid(_dense(y, out_w, out_b))

    return f


def slope_time(fn, feats, n_long):
    def probe(o):
        return jnp.max(jnp.abs(o.astype(jnp.float32)))

    float(probe(fn(feats[0])))

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(feats[i % 2])
        float(probe(out))
        return time.perf_counter() - t0

    return slope_from_run(run, n_long)


def main():
    params = nsnet2.init_params(jax.random.PRNGKey(0))
    mode_list = [("bf16_io", "default", "bf16")]
    if os.environ.get("BENCH_MODES") == "all":
        mode_list = [
            ("highest", "highest", "f32"),
            ("bf16", "default", "f32"),
            ("bf16_io", "default", "bf16"),
        ]
    gen = jax.jit(
        lambda key: -8.0
        + 2.0 * jax.random.normal(key, (ROWS, T, nsnet2.N_BINS), jnp.float32)
    )
    feats = [gen(jax.random.PRNGKey(i)) for i in range(2)]

    makers = {
        "plain": make_plain,
        "split3": make_split3,
        "whpad": make_whpad,
        "kpad512": make_kpad512,
    }

    for mode_name, level, io in mode_list:
        precision.set_matmul_precision(level)
        precision.set_io_dtype(io)
        fns = {k: jax.jit(m(params)) for k, m in makers.items()}
        print(f"== mode={mode_name} ==", flush=True)
        # Exactness gates vs plain on one input (bitwise expected for
        # split3/whpad; ~ulp reassociation allowed for kpad512).
        ref = fns["plain"](feats[0])
        for name in ("split3", "whpad", "kpad512"):
            d = float(jnp.max(jnp.abs(fns[name](feats[0]) - ref)))
            print(f"  gate {name:8s} max|d| = {d:.3e}", flush=True)
        results = {}
        for rep in range(REPS):
            for name, fn in fns.items():
                dt = slope_time(fn, feats, N_ITERS)
                results.setdefault(name, []).append(dt)
                print(f"  rep{rep} {name:8s} {dt*1e3:7.2f} ms", flush=True)
        mins = {k: min(v) for k, v in results.items()}
        print(
            "  => " + "  ".join(f"{k} {v*1e3:.2f}" for k, v in mins.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
