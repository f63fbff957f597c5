"""Cross-slab pipelined front-end (``offline.window_inputs_pipelined``).

The pipeline moves WHEN slab s's segment matmul executes (inside slab s-1's
GRU scan, as rider work) — never what it computes.  These tests pin:

* the rider's row-sliced segment product matches ``segmat_prod`` to <=1 ulp
  (XLA:CPU's gemm K-blocking depends on the row count, so CPU is not
  bitwise; the TPU MXU's contraction order is M-independent and the on-chip
  A/B asserts bitwise there — PARITY.md deviation 12),
* the pipelined window inputs + carries track the plain carried path over a
  chained multi-slab run (incl. a ragged final slab); ratios/valid — which
  derive from the raw audio only — stay BITWISE,
* the rider mechanism leaves NSNet2's gains/state bitwise unchanged,
* SlabRunner with FVAD_SLAB_PIPELINE=on produces identical segments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.pipeline import offline, vad

CFG = VADMachineConfig(long_term_speech_avg_sec=10.0)


@pytest.fixture(autouse=True)
def _composite_on(monkeypatch):
    # The pipelined paths are composite-band only (slab_runner.py forces
    # pipeline_fe off otherwise); the production default is materialize
    # after the on-chip band-fold A/B, so force composite on here.
    monkeypatch.setenv("FVAD_BAND_COMPOSITE", "on")
    # The rider reproduces the FUSED basis program row-sliced (PARITY
    # dev. 13): its <=1-ulp-vs-plain contracts are same-program claims,
    # so pin the fused STFT for this module (rider chains can't run the
    # predecim split). Same for the fused GRU projections: the rider/deep
    # scan steps always run the fused [400, 1200] form, so the plain
    # baselines must not take the split3 path at default precision.
    offline.set_stft_predecim(False)
    nsnet2.set_gru_split3("off")
    yield
    offline.set_stft_predecim(None)
    nsnet2.set_gru_split3(None)


@pytest.fixture(scope="module")
def st():
    return vad.statics_from_config(VADConfig(vad_machine_config=CFG))


@pytest.fixture(scope="module")
def params():
    return nsnet2.load(None)


def _audio(rng, c, t):
    return jnp.asarray(0.05 * rng.standard_normal((c, t)), jnp.float32)


def test_rider_prod_close(params, st):
    """Row-sliced rider product == one-shot segmat_prod to <=1 ulp on CPU
    (bitwise on TPU — benchmarks/pipeline_ab.py asserts it on chip),
    including pad rows and a nonzero raw tail."""
    rng = np.random.default_rng(0)
    chunk = st.chunk_size
    audio_next = _audio(rng, 2, 8 * chunk)
    raw_tail = _audio(rng, 2, 480)
    rider, assemble = offline.next_slab_rider(audio_next, raw_tail)
    fn, xs = rider
    got = np.asarray(assemble(jax.lax.map(fn, xs)))
    # The rider reproduces the FUSED basis program (PARITY dev. 13):
    # compare against the fused one-shot product, not the predecim default.
    want = np.asarray(offline.segmat_prod(audio_next, raw_tail, predecim=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_rider_does_not_change_gains(params):
    """apply_streaming with a rider returns bitwise the riderless gains and
    state (the rider shares the scan but not the dataflow)."""
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((3, 54, 161)), jnp.float32)
    h0 = jnp.zeros((3, nsnet2.HIDDEN), jnp.float32)
    st0 = (h0, h0)
    state_a, gains_a = nsnet2.apply_streaming(params, st0, feats, out_frames=50)
    xs = jnp.asarray(rng.standard_normal((54, 8, 16)), jnp.float32)
    state_b, gains_b, rider_ys = nsnet2.apply_streaming(
        params, st0, feats, out_frames=50, rider=(lambda x: 2.0 * x, xs)
    )
    np.testing.assert_array_equal(np.asarray(gains_a), np.asarray(gains_b))
    for a, b in zip(state_a, state_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(rider_ys), np.asarray(2.0 * xs))


def test_rider_composes_with_wavefront(params, monkeypatch):
    """FVAD_GRU_WAVEFRONT=on: the rider rides the wavefront schedule too —
    gains/state bitwise the riderless wavefront run, rider outputs complete
    and in order (slices 0..T-2 in the scan, T-1 in the epilogue)."""
    monkeypatch.setenv("FVAD_GRU_WAVEFRONT", "on")
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((3, 54, 161)), jnp.float32)
    h0 = jnp.zeros((3, nsnet2.HIDDEN), jnp.float32)
    state_a, gains_a = nsnet2.apply_streaming(params, (h0, h0), feats, out_frames=50)
    xs = jnp.asarray(rng.standard_normal((54, 8, 16)), jnp.float32)
    state_b, gains_b, rider_ys = nsnet2.apply_streaming(
        params, (h0, h0), feats, out_frames=50, rider=(lambda x: 2.0 * x, xs)
    )
    np.testing.assert_array_equal(np.asarray(gains_a), np.asarray(gains_b))
    for a, b in zip(state_a, state_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(rider_ys), np.asarray(2.0 * xs))


@pytest.mark.parametrize("ragged", [False, True])
def test_pipelined_chain_bitwise(params, st, ragged):
    """Chained pipelined slabs == chained plain slabs (window inputs and
    den-carry bitwise), with the final slab's rider fed zeros."""
    rng = np.random.default_rng(2)
    chunk = st.chunk_size
    slab_chunks = 32  # 16 s: window accumulator empty at boundaries
    n_slabs = 3
    slabs = [_audio(rng, 2, slab_chunks * chunk) for _ in range(n_slabs)]
    valids = [jnp.int32(slab_chunks)] * n_slabs
    if ragged:
        valids[-1] = jnp.int32(slab_chunks - 5)

    # Plain carried path.
    carry_a = offline.init_slab_carry(2)
    outs_a = []
    for s in range(n_slabs):
        carry_a, mv, rt, va, _ = offline.window_inputs_carry(
            params, st, slabs[s], carry_a, valids[s]
        )
        outs_a.append((mv, rt, va))

    # Pipelined: prologue product, then every front-end rides the scan.
    carry_b = offline.init_slab_carry(2)
    prod = offline.segmat_prod(slabs[0], carry_b["raw_tail"], predecim=False)
    outs_b = []
    for s in range(n_slabs):
        nxt = slabs[s + 1] if s + 1 < n_slabs else jnp.zeros_like(slabs[s])
        carry_b, mv, rt, va, prod = offline.window_inputs_pipelined(
            params, st, slabs[s], prod, carry_b, valids[s], nxt
        )
        outs_b.append((mv, rt, va))

    for (a_mv, a_rt, a_va), (b_mv, b_rt, b_va) in zip(outs_a, outs_b):
        # min_vol flows through the (row-count-sensitive on CPU) front-end
        # matmul: <=1 ulp there; ratios/valid derive from raw audio: bitwise.
        np.testing.assert_allclose(
            np.asarray(a_mv), np.asarray(b_mv), rtol=3e-6, atol=1e-11
        )
        np.testing.assert_array_equal(np.asarray(a_rt), np.asarray(b_rt))
        np.testing.assert_array_equal(np.asarray(a_va), np.asarray(b_va))
    for k in carry_a:
        np.testing.assert_allclose(
            np.asarray(carry_a[k]), np.asarray(carry_b[k]),
            rtol=3e-6, atol=1e-7, err_msg=k,
        )


@pytest.mark.parametrize("ragged", [False, True])
def test_deep_chain_tracks_plain(params, st, ragged):
    """Stage-2 deep pipeline: call s emits slab s-1 (priming emission
    dropped, flush call drains the last slab) — emissions track the plain
    carried path (<=1 ulp min_vol on CPU, bitwise ratios/valid), and the
    den-carry's feat/raw chains stay bitwise."""
    rng = np.random.default_rng(6)
    chunk = st.chunk_size
    slab_chunks, n_slabs = 32, 3
    slabs = [_audio(rng, 2, slab_chunks * chunk) for _ in range(n_slabs)]
    valids = [jnp.int32(slab_chunks)] * n_slabs
    if ragged:
        valids[-1] = jnp.int32(slab_chunks - 7)

    carry_a = offline.init_slab_carry(2)
    outs_a = []
    for s in range(n_slabs):
        carry_a, mv, rt, va, _ = offline.window_inputs_carry(
            params, st, slabs[s], carry_a, valids[s]
        )
        outs_a.append((mv, rt, va))

    den = offline.init_slab_carry(2)
    deep = offline.init_deep_state(2, slab_chunks, st.fft_size)
    prod = offline.segmat_prod(slabs[0], den["raw_tail"], predecim=False)
    emissions = []
    for s in range(n_slabs):
        nxt = slabs[s + 1] if s + 1 < n_slabs else jnp.zeros_like(slabs[s])
        den, deep, em, prod = offline.window_inputs_deep(
            params, st, slabs[s], prod, deep, den, valids[s], nxt
        )
        emissions.append(em)
    zero = jnp.zeros_like(slabs[0])
    _, _, em, _ = offline.window_inputs_deep(
        params, st, zero, prod, deep, den, jnp.int32(0), zero
    )
    emissions.append(em)

    for (a_mv, a_rt, a_va), (b_mv, b_rt, b_va) in zip(outs_a, emissions[1:]):
        np.testing.assert_allclose(
            np.asarray(a_mv), np.asarray(b_mv), rtol=3e-6, atol=1e-11
        )
        np.testing.assert_array_equal(np.asarray(a_rt), np.asarray(b_rt))
        np.testing.assert_array_equal(np.asarray(a_va), np.asarray(b_va))
    # feat/raw den-carry chains (out_tail/last_sample live in `deep`, one
    # slab delayed — checked implicitly through the emitted min_vol).
    for k in ("raw_tail", "feat_ctx"):
        np.testing.assert_allclose(
            np.asarray(carry_a[k]), np.asarray(den[k]), rtol=3e-6, atol=1e-7,
            err_msg=k,
        )


def test_pipelined_bf16_io_tracks_plain(params, st):
    """Under the bf16 activation-storage tier the pipelined path tracks the
    plain path (same dtypes throughout — prod/rider are io_cast like
    stft_segmat; <=bf16-rounding agreement on min_vol; bitwise ratios)."""
    from formula_vad_tpu.ops import precision

    precision.set_io_dtype("bf16")
    try:
        rng = np.random.default_rng(5)
        chunk = st.chunk_size
        slabs = [_audio(rng, 2, 32 * chunk) for _ in range(2)]
        valid = jnp.int32(32)

        carry_a = offline.init_slab_carry(2)
        outs_a = []
        for s in range(2):
            carry_a, mv, rt, va, _ = offline.window_inputs_carry(
                params, st, slabs[s], carry_a, valid
            )
            outs_a.append((mv, rt, va))

        carry_b = offline.init_slab_carry(2)
        prod = offline.segmat_prod(slabs[0], carry_b["raw_tail"], predecim=False)
        assert prod.dtype == jnp.bfloat16
        outs_b = []
        for s in range(2):
            nxt = slabs[s + 1] if s + 1 < 2 else jnp.zeros_like(slabs[s])
            carry_b, mv, rt, va, prod = offline.window_inputs_pipelined(
                params, st, slabs[s], prod, carry_b, valid, nxt
            )
            outs_b.append((mv, rt, va))

        for (a_mv, a_rt, a_va), (b_mv, b_rt, b_va) in zip(outs_a, outs_b):
            assert a_mv.dtype == b_mv.dtype  # decision inputs stay f32
            np.testing.assert_allclose(
                np.asarray(a_mv), np.asarray(b_mv), rtol=2e-2, atol=1e-8
            )
            np.testing.assert_array_equal(np.asarray(a_rt), np.asarray(b_rt))
            np.testing.assert_array_equal(np.asarray(a_va), np.asarray(b_va))
    finally:
        precision.set_io_dtype("f32")


def test_slab_runner_pipelined_segments(params, st):
    """SlabRunner FVAD_SLAB_PIPELINE=on emits identical segments."""
    from formula_vad_tpu.parallel.slab_runner import SlabRunner

    def speechy(n_chunks, bursts, seed):
        rng = np.random.default_rng(seed)
        t_total = n_chunks * 24000
        t = np.arange(t_total) / 48000.0
        base = 0.003 * rng.standard_normal((2, t_total))
        env = np.zeros(t_total)
        for a, d in bursts:
            env[int(a * 48000) : int((a + d) * 48000)] = 1.0
        s = (
            0.25 * np.sin(2 * np.pi * 700 * t) + 0.15 * np.sin(2 * np.pi * 1300 * t)
        ) * env
        return (base + np.stack([s, 0.9 * s])).astype(np.float32)

    audio = np.stack(
        [
            speechy(70, [(3.0, 2.0), (14.0, 1.5), (25.0, 2.5)], seed=1),
            speechy(70, [(1.0, 1.2), (10.0, 2.0), (30.0, 1.8)], seed=2),
        ]
    )  # ~2.2 slabs at 32-chunk slabs, ragged tail

    cfg = VADConfig(vad_machine_config=CFG)

    def run(pipelined, **kw):
        r = SlabRunner(
            params, cfg, slab_chunks=32, use_mesh=False, use_pallas_fsm=False,
            pipeline_fe=pipelined, **kw,
        )
        return r.run(audio)

    res_a, res_b = run(False), run(True)
    assert [r.segments for r in res_a] == [r.segments for r in res_b]
    assert any(r.segments for r in res_a), "test corpus produced no segments"

    # Deep mode (host-FSM loop, emissions lag one call + flush): same
    # segments. Requires the host decoder; skip quietly without it.
    from formula_vad_tpu.pipeline import fsm_host

    if fsm_host.available():
        res_d = run("deep")
        assert [r.segments for r in res_a] == [r.segments for r in res_d]

    # Device-FSM loop (multi-process/sharded configuration): the pipelined
    # slab_pipe_fn + prod threading there too, same segments.
    res_c = run(True, use_host_fsm=False)
    assert [r.segments for r in res_a] == [r.segments for r in res_c]

    # Alt machine rows through the pipelined device-FSM step.
    alt_cfg = VADConfig(
        vad_machine_config=CFG,
        alt_vad_machine_configs=(
            CFG,
            VADMachineConfig(
                long_term_speech_avg_sec=10.0, speech_threshold_factor=1000.0
            ),
        ),
    )
    r = SlabRunner(
        params, alt_cfg, slab_chunks=32, use_mesh=False, use_pallas_fsm=False,
        pipeline_fe=True, use_host_fsm=False,
    )
    for i, res in enumerate(r.run(audio)):
        assert res.alt_segments[0] == res_a[i].segments
        assert res.alt_segments[1] == []


def test_slab_runner_pipelined_mesh(params, st):
    """Pipelined SlabRunner over the 8-virtual-device mesh: the rider scan
    + prod threading must compile and run under batch sharding, and the
    segments must match the unsharded pipelined run."""
    import jax

    from formula_vad_tpu.parallel.slab_runner import SlabRunner

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(7)
    b, t = 8, 40 * 24000
    tt = np.arange(t) / 48000.0
    batch = (0.003 * rng.standard_normal((b, 2, t))).astype(np.float32)
    for i in range(0, b, 2):
        sl = slice(int(1.0 * 48000), int(3.0 * 48000))
        burst = (0.3 * np.sin(2 * np.pi * (700 + 10 * i) * tt[sl])).astype(np.float32)
        batch[i, 0, sl] += burst
        batch[i, 1, sl] += 0.9 * burst

    cfg = VADConfig(vad_machine_config=CFG)

    def run(use_mesh):
        r = SlabRunner(
            params, cfg, slab_chunks=32, use_mesh=use_mesh,
            use_pallas_fsm=False, pipeline_fe=True,
        )
        return r.run(batch)

    res_mesh, res_solo = run(True), run(False)
    assert [r.segments for r in res_mesh] == [r.segments for r in res_solo]
    assert any(r.segments for r in res_mesh)
