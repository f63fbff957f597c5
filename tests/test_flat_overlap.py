"""Flat cross-slab overlap (``offline.window_inputs_flat``).

Unlike the rider pipeline (tests/test_pipelined.py, composite-only,
measured a LOSS on chip), the flat mode overlaps on the MATERIALIZE
scoring path — the shipping default after the band-fold A/B — and is
bitwise-trivial: the carried product is produced by the identical
one-shot ``segmat_prod`` op; only WHICH program computes it moves.
These tests pin:

* chained flat slabs == chained plain slabs (``window_inputs_carry``)
  BITWISE — window inputs and den-carry — incl. a ragged final slab,
* SlabRunner FVAD_SLAB_PIPELINE=flat emits identical segments in the
  host-FSM and device-FSM loops and under the 8-device mesh,
* flat mode is refused (falls back off) when the composite band path is
  forced on (it scores via the materialize chain by construction).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from formula_vad_tpu.config import VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.pipeline import offline, vad

CFG = VADMachineConfig(long_term_speech_avg_sec=10.0)


@pytest.fixture(scope="module")
def st():
    return vad.statics_from_config(VADConfig(vad_machine_config=CFG))


@pytest.fixture(scope="module")
def params():
    return nsnet2.load(None)


def _audio(rng, c, t):
    return jnp.asarray(0.05 * rng.standard_normal((c, t)), jnp.float32)


@pytest.mark.parametrize("ragged", [False, True])
def test_flat_chain_bitwise(params, st, ragged):
    """Chained flat slabs == chained plain slabs, bitwise (same ops, only
    the computing program moves), with the final slab's next-product fed
    zeros and discarded."""
    rng = np.random.default_rng(3)
    chunk = st.chunk_size
    slab_chunks = 32  # 16 s: window accumulator empty at boundaries
    n_slabs = 3
    slabs = [_audio(rng, 2, slab_chunks * chunk) for _ in range(n_slabs)]
    valids = [jnp.int32(slab_chunks)] * n_slabs
    if ragged:
        valids[-1] = jnp.int32(slab_chunks - 5)

    carry_a = offline.init_slab_carry(2)
    outs_a = []
    for s in range(n_slabs):
        carry_a, mv, rt, va, _ = offline.window_inputs_carry(
            params, st, slabs[s], carry_a, valids[s]
        )
        outs_a.append((mv, rt, va))

    carry_b = offline.init_slab_carry(2)
    prod = offline.segmat_prod(slabs[0], carry_b["raw_tail"])
    outs_b = []
    for s in range(n_slabs):
        nxt = slabs[s + 1] if s + 1 < n_slabs else jnp.zeros_like(slabs[s])
        carry_b, mv, rt, va, prod = offline.window_inputs_flat(
            params, st, slabs[s], prod, carry_b, valids[s], nxt
        )
        outs_b.append((mv, rt, va))

    for (a_mv, a_rt, a_va), (b_mv, b_rt, b_va) in zip(outs_a, outs_b):
        np.testing.assert_array_equal(np.asarray(a_mv), np.asarray(b_mv))
        np.testing.assert_array_equal(np.asarray(a_rt), np.asarray(b_rt))
        np.testing.assert_array_equal(np.asarray(a_va), np.asarray(b_va))
    for k in carry_a:
        np.testing.assert_array_equal(
            np.asarray(carry_a[k]), np.asarray(carry_b[k]), err_msg=k
        )


def _speechy(n_chunks, bursts, seed):
    rng = np.random.default_rng(seed)
    t_total = n_chunks * 24000
    t = np.arange(t_total) / 48000.0
    base = 0.003 * rng.standard_normal((2, t_total))
    env = np.zeros(t_total)
    for a, d in bursts:
        env[int(a * 48000) : int((a + d) * 48000)] = 1.0
    s = (0.25 * np.sin(2 * np.pi * 700 * t) + 0.15 * np.sin(2 * np.pi * 1300 * t)) * env
    return (base + np.stack([s, 0.9 * s])).astype(np.float32)


def test_slab_runner_flat_segments(params, st):
    """SlabRunner pipeline_fe="flat" emits identical segments (host-FSM and
    device-FSM loops)."""
    from formula_vad_tpu.parallel.slab_runner import SlabRunner

    audio = np.stack(
        [
            _speechy(70, [(3.0, 2.0), (14.0, 1.5), (25.0, 2.5)], seed=1),
            _speechy(70, [(1.0, 1.2), (10.0, 2.0), (30.0, 1.8)], seed=2),
        ]
    )  # ~2.2 slabs at 32-chunk slabs, ragged tail
    cfg = VADConfig(vad_machine_config=CFG)

    def run(pipelined, **kw):
        r = SlabRunner(
            params, cfg, slab_chunks=32, use_mesh=False, use_pallas_fsm=False,
            pipeline_fe=pipelined, **kw,
        )
        return r.run(audio)

    res_a = run(False)
    assert any(r.segments for r in res_a), "test corpus produced no segments"

    res_f = run("flat")
    assert [r.segments for r in res_a] == [r.segments for r in res_f]

    res_d = run("flat", use_host_fsm=False)
    assert [r.segments for r in res_a] == [r.segments for r in res_d]


def test_slab_runner_flat_mesh(params, st):
    """Flat SlabRunner over the 8-virtual-device mesh compiles and matches
    the unsharded run."""
    import jax

    from formula_vad_tpu.parallel.slab_runner import SlabRunner

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
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
            use_pallas_fsm=False, pipeline_fe="flat",
        )
        return r.run(batch)

    res_mesh, res_solo = run(True), run(False)
    assert [r.segments for r in res_mesh] == [r.segments for r in res_solo]
    assert any(r.segments for r in res_mesh)


def test_flat_refused_under_composite(params, monkeypatch):
    """pipeline_fe="flat" + composite band forced on -> falls back to off
    (flat scores via the materialize chain by construction)."""
    from formula_vad_tpu.parallel.slab_runner import SlabRunner

    monkeypatch.setenv("FVAD_BAND_COMPOSITE", "on")
    r = SlabRunner(
        params, VADConfig(vad_machine_config=CFG), slab_chunks=32,
        use_mesh=False, use_pallas_fsm=False, pipeline_fe="flat",
    )
    assert r.pipeline_fe == "off"
