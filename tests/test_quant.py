"""Int8 denoiser-model tier (FVAD_QUANT=int8, models/nsnet2_q8.py).

A throughput-serving tier, not a parity mode: these tests pin (a) the
quantization error at the gain-mask level is small and deterministic,
(b) the routing guards (rider / defer_head / lbr=0 keep the float paths),
(c) dtype contracts under the io policy, and (d) the bounded-state
invariant the static in-scan scale relies on (|h| <= 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.models import nsnet2, registry
from formula_vad_tpu.ops import precision


@pytest.fixture(autouse=True)
def _restore_precision():
    yield
    precision.set_quant("off")
    precision.set_matmul_precision("highest")
    precision.set_io_dtype("f32")


@pytest.fixture(scope="module")
def demo_params():
    return registry.load_denoiser("demo")


@pytest.fixture(scope="module")
def feats():
    # Log-power-spectrum-shaped features: mostly in [-12, 2] like real audio.
    rng = np.random.RandomState(7)
    return jnp.asarray((rng.rand(2, 54, 161) * 10.0 - 9.0).astype(np.float32))


def test_q8_gains_close_to_f32(demo_params, feats):
    ref = np.asarray(nsnet2.apply(demo_params, feats, out_frames=50), np.float64)
    precision.set_quant("int8")
    q8 = np.asarray(nsnet2.apply(demo_params, feats, out_frames=50), np.float64)
    err = np.abs(q8 - ref)
    # Gains live in (0, 1); int8 carries ~2 decimal digits end to end.
    assert err.mean() < 2e-2, err.mean()
    assert err.max() < 2e-1, err.max()
    # And the path genuinely differs from the float one (guards against the
    # routing silently falling through — a vacuous pass).
    assert err.max() > 0.0


def test_q8_apply_matches_streaming_zero_state(demo_params, feats):
    precision.set_quant("int8")
    g1 = np.asarray(nsnet2.apply(demo_params, feats))
    st0 = nsnet2.zero_state((2,))
    _, g2 = nsnet2.apply_streaming(demo_params, st0, feats)
    np.testing.assert_array_equal(g1, np.asarray(g2))


def test_q8_state_bounded_and_dtype_preserved(demo_params):
    # Large-magnitude features must not overflow the static in-scan scale:
    # |h| <= 1 is a gate-algebra invariant, independent of input range.
    wild = jnp.asarray(np.random.RandomState(0).randn(3, 30, 161).astype(np.float32) * 50)
    precision.set_quant("int8")
    (h1, h2), gains = nsnet2.apply_streaming(
        demo_params, nsnet2.zero_state((3,)), wild
    )
    assert h1.dtype == jnp.float32 and h2.dtype == jnp.float32
    assert float(jnp.abs(h1).max()) <= 1.0 + 1e-6
    assert float(jnp.abs(h2).max()) <= 1.0 + 1e-6
    assert bool(jnp.all(jnp.isfinite(gains)))
    assert bool(jnp.all((gains >= 0) & (gains <= 1)))


def test_q8_respects_io_dtype(demo_params, feats):
    precision.set_quant("int8")
    precision.set_matmul_precision("default")
    precision.set_io_dtype("bf16")
    st0 = nsnet2.zero_state((2,))
    (h1, h2), gains = nsnet2.apply_streaming(demo_params, st0, feats)
    assert gains.dtype == jnp.bfloat16  # big activations stored bf16
    assert h1.dtype == jnp.float32  # carry dtype preserved for the caller


def test_q8_rider_keeps_float_path(demo_params, feats):
    # The rider opt-in pins the float program (its bitwise A/B gates compare
    # float chains); quant on must not change its output at all.
    xs = jnp.arange(54, dtype=jnp.float32)
    rider = (lambda x: x * 2.0, xs)
    ref, ref_rider = nsnet2.apply(demo_params, feats, rider=rider)
    precision.set_quant("int8")
    got, got_rider = nsnet2.apply(demo_params, feats, rider=rider)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_array_equal(np.asarray(ref_rider), np.asarray(got_rider))


def test_q8_lbr0_keeps_float_path(feats):
    p = nsnet2.init_params(jax.random.PRNGKey(3))
    lbr0 = lambda g: nsnet2.GRUParams(g.wi, g.wh, g.bi, g.bh, linear_before_reset=0)
    p = nsnet2.NSNet2Params(
        p.fc_in_w, p.fc_in_b, lbr0(p.gru1), lbr0(p.gru2),
        p.ff1_w, p.ff1_b, p.ff2_w, p.ff2_b, p.out_w, p.out_b,
    )
    ref = np.asarray(nsnet2.apply(p, feats))
    precision.set_quant("int8")
    got = np.asarray(nsnet2.apply(p, feats))
    np.testing.assert_array_equal(ref, got)


def test_q8_chunk_step_close_to_float(demo_params):
    # Full-step scope at the production serving precision: window inputs
    # (the FSM decision feed) stay within a few percent of the float tier.
    from formula_vad_tpu.config import VADConfig
    from formula_vad_tpu.pipeline import vad

    st = vad.statics_from_config(VADConfig())
    rng = np.random.RandomState(11)
    chunks = jnp.asarray(0.05 * rng.randn(3, 2, st.chunk_size).astype(np.float32))
    precision.set_matmul_precision("default")

    def run():
        c = vad.init_carry(st)
        step = jax.jit(
            lambda c, a: vad.chunk_step(demo_params, st, c, a, run_fsm=False)
        )
        mvs = []
        for i in range(3):
            c, out = step(c, chunks[i])
            mvs.append(np.asarray(out.min_vol, np.float64))
        return np.concatenate(mvs)

    ref = run()
    precision.set_quant("int8")
    q8 = run()
    assert np.abs(q8 - ref).max() <= 0.05 * max(np.abs(ref).max(), 1e-9)
    assert np.abs(q8 - ref).max() > 0.0  # the quant path genuinely ran


def test_q8_under_vmap_matches_per_stream(demo_params, feats):
    # The serving tick runs the q8 path INSIDE vmap(chunk_step); quantized
    # math is exact integer + deterministic float epilogue, so the vmapped
    # batch must equal per-stream calls bitwise (also covers dot_q8's
    # custom_vmap row-collapse rule when FVAD_Q8_KERNEL engages it).
    precision.set_quant("int8")
    batch = jnp.stack([feats, feats * 0.5 + 1.0])  # [2, 2, 54, 161]
    got = jax.jit(jax.vmap(lambda f: nsnet2.apply(demo_params, f)))(batch)
    for i in range(2):
        solo = nsnet2.apply(demo_params, batch[i])
        # Not bitwise: XLA may compute the PRE-quant float chain ~1 ulp
        # differently under batching (PARITY deviation-13 class), and a
        # 1-ulp nudge at a rounding boundary flips an int8 BUCKET — the
        # output then moves by a quantization quantum (measured max 0.014
        # on these inputs). Pin the quant-noise scale: an axis/batching
        # bug would produce O(0.5) garbage, orders above this bound.
        d = np.abs(np.asarray(got[i], np.float64) - np.asarray(solo, np.float64))
        assert d.max() < 0.05, d.max()
        assert d.mean() < 5e-3, d.mean()


def test_dot_q8_vmap_collapse_exact():
    # dot_q8's custom_vmap rule collapses mapped axes into kernel rows;
    # pin it (with row scales) against the unbatched call and an int64
    # reference, through jit+vmap+scan like the serving step.
    from formula_vad_tpu.ops.matmul_q8 import dot_q8

    rng = np.random.RandomState(5)
    b8 = jnp.asarray(rng.randint(-127, 128, (400, 1200), np.int8))
    s = jnp.asarray(rng.rand(1, 1200).astype(np.float32))
    a = jnp.asarray(rng.randint(-127, 128, (6, 2, 400), np.int8))
    row = jnp.asarray(rng.rand(6, 2, 1).astype(np.float32))
    got = jax.jit(jax.vmap(lambda x, r: dot_q8(x, b8, s, row_scale=r)))(a, row)
    ref = (
        np.asarray(a, np.int64).reshape(12, 400) @ np.asarray(b8, np.int64)
    ).astype(np.float32) * np.asarray(s) * np.asarray(row).reshape(12, 1)
    np.testing.assert_array_equal(np.asarray(got).reshape(12, 1200), ref)

    def body(c, x):
        return c, dot_q8(x, b8, s)

    xs = jnp.asarray(rng.randint(-127, 128, (3, 4, 2, 400), np.int8))
    _, ys = jax.jit(jax.vmap(lambda x: jax.lax.scan(body, 0.0, x)))(xs)
    ref2 = (
        np.asarray(xs, np.int64).reshape(-1, 400) @ np.asarray(b8, np.int64)
    ).astype(np.float32) * np.asarray(s)
    np.testing.assert_array_equal(
        np.asarray(ys).reshape(-1, 1200), ref2
    )


def test_matmul_q8_kernel_exact():
    # The fused-dequant Pallas kernel (interpret mode on CPU) against an
    # exact int64 reference: int8 x int8 -> int32 is exact, the epilogue
    # is one f32 multiply per output.
    import jax.numpy as jnp

    from formula_vad_tpu.ops.matmul_q8 import matmul_q8

    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randint(-127, 128, (512, 400), np.int8))
    b = jnp.asarray(rng.randint(-127, 128, (400, 1200), np.int8))
    s = jnp.asarray(rng.rand(1, 1200).astype(np.float32))
    ref = (np.asarray(a, np.int64) @ np.asarray(b, np.int64)).astype(
        np.float32
    ) * np.asarray(s)
    got = matmul_q8(a, b, s, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), ref)
    got16 = matmul_q8(a, b, s, out_dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got16), np.asarray(ref.astype(jnp.bfloat16))
    )
    with pytest.raises(ValueError):
        matmul_q8(a[:100], b, s, interpret=True)  # rows not a TILE multiple


def test_set_quant_validates():
    with pytest.raises(ValueError):
        precision.set_quant("int4")
    assert not precision.quant_int8()
    precision.set_quant("int8")
    assert precision.quant_int8()
