"""OnlineBatchServer: lockstep multi-stream serving must reproduce the
single-stream AudioPipeline exactly (the batched device step replaces N
solo steps; host assembly is the same code), and valid-mask freezing must
resume streams where they left off."""

import numpy as np
import pytest

from formula_vad_tpu.config import PipelineConfig, VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.parallel.online import OnlineBatchServer
from formula_vad_tpu.pipeline.pipeline import AudioPipeline

CFG = VADMachineConfig(long_term_speech_avg_sec=10.0)


@pytest.fixture(scope="module")
def params():
    import jax

    return nsnet2.init_params(jax.random.PRNGKey(42))


def speechy(n_chunks, bursts, seed, chunk=24000):
    rng = np.random.default_rng(seed)
    t_total = n_chunks * chunk
    t = np.arange(t_total) / 48000.0
    base = 0.003 * rng.standard_normal((2, t_total))
    env = np.zeros(t_total)
    for s, d in bursts:
        env[int(s * 48000) : int((s + d) * 48000)] = 1.0
    sp = (0.25 * np.sin(2 * np.pi * 700 * t) + 0.15 * np.sin(2 * np.pi * 1300 * t)) * env
    return (base + np.stack([sp, 0.9 * sp])).astype(np.float32)


def _cfg():
    return PipelineConfig(vad_config=VADConfig(vad_machine_config=CFG))


def test_batched_matches_solo(params):
    n_chunks = 16
    audios = [
        speechy(n_chunks, [(2.0, 2.0)], seed=1),
        np.zeros((2, n_chunks * 24000), np.float32),
        speechy(n_chunks, [(1.0, 1.5), (5.5, 1.5)], seed=2),
    ]

    solos = []
    for a in audios:
        p = AudioPipeline(_cfg(), params)
        p.push_samples(a)
        solos.append(p.segments)

    server = OnlineBatchServer(_cfg(), n_streams=3, params=params)
    for k in range(n_chunks):
        chunks = np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios])
        server.push(chunks)

    assert server.segments == solos
    assert any(solos), "test audio must produce segments"


def test_valid_mask_freezes_and_resumes(params):
    """A stream fed its chunks with idle (valid=False) ticks interleaved
    must produce exactly the segments of contiguous processing."""
    n_chunks = 12
    audio = speechy(n_chunks, [(1.5, 2.0)], seed=3)

    solo = AudioPipeline(_cfg(), params)
    solo.push_samples(audio)

    server = OnlineBatchServer(_cfg(), n_streams=2, params=params)
    other = speechy(2 * n_chunks, [(4.0, 2.0)], seed=4)
    zeros = np.zeros((2, 24000), np.float32)
    for k in range(2 * n_chunks):
        # stream 0 gets a real chunk only on even ticks; stream 1 runs
        # continuously so the batch keeps advancing.
        feed0 = k % 2 == 0 and k // 2 < n_chunks
        c0 = audio[:, (k // 2) * 24000 : (k // 2 + 1) * 24000] if feed0 else zeros
        c1 = other[:, k * 24000 : (k + 1) * 24000]
        server.push(np.stack([c0, c1]), valid=np.array([feed0, True]))

    assert server.pipelines[0].segments == solo.segments
    assert solo.segments, "test audio must produce segments"


def test_sharded_server_matches_solo(params):
    """Serving sharded over the virtual 8-device mesh must equal solo
    pipelines (the mesh only changes placement, not numerics)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    n_chunks = 12
    audios = [speechy(n_chunks, [(1.5, 1.5)], seed=10 + i) for i in range(8)]

    solos = []
    for a in audios:
        p = AudioPipeline(_cfg(), params)
        p.push_samples(a)
        solos.append(p.segments)

    server = OnlineBatchServer(_cfg(), n_streams=8, params=params, use_mesh=True)
    for k in range(n_chunks):
        server.push(np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios]))
    assert server.segments == solos
    assert any(solos)


def test_random_valid_patterns_match_solo(params):
    """Property: any interleaving of idle ticks reproduces contiguous
    processing exactly, for every stream independently."""
    rng = np.random.default_rng(0)
    n_chunks = 8
    audios = [speechy(n_chunks, [(1.0, 1.5)], seed=20 + i) for i in range(3)]

    solos = []
    for a in audios:
        p = AudioPipeline(_cfg(), params)
        p.push_samples(a)
        solos.append(p.segments)

    server = OnlineBatchServer(_cfg(), n_streams=3, params=params)
    fed = [0, 0, 0]
    zeros = np.zeros((2, 24000), np.float32)
    while min(fed) < n_chunks:
        valid = np.array([fed[i] < n_chunks and rng.random() < 0.6 for i in range(3)])
        if not valid.any():
            continue
        chunks = np.stack([
            audios[i][:, fed[i] * 24000 : (fed[i] + 1) * 24000] if valid[i] else zeros
            for i in range(3)
        ])
        server.push(chunks, valid=valid)
        for i in range(3):
            fed[i] += int(valid[i])
    assert server.segments == solos


def test_server_checkpoint_resume(params, tmp_path):
    """Kill the server mid-stream (while a recording is in flight), restore,
    continue: segments AND recordings must equal an uninterrupted run
    (bit-identical failover, including the in-flight recorder buffers)."""
    from formula_vad_tpu.pipeline.pipeline import Callbacks

    n_chunks = 16
    audios = [speechy(n_chunks, [(2.0, 2.0)], seed=5),
              speechy(n_chunks, [(4.5, 2.0)], seed=6)]

    def collectors(n):
        recs = [[] for _ in range(n)]
        cbs = [
            Callbacks(
                on_original_recording=lambda b, i=i: recs[i].append(
                    (b.global_start_frame_number, b.channel_pcm.tobytes())
                )
            )
            for i in range(n)
        ]
        return recs, cbs

    ref_recs, ref_cbs = collectors(2)
    ref = OnlineBatchServer(_cfg(), n_streams=2, params=params, callbacks=ref_cbs)
    for k in range(n_chunks):
        ref.push(np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios]))

    half = n_chunks // 2  # 4 s: stream 0's 2-4 s burst recording is ACTIVE
    r1, cbs1 = collectors(2)
    s1 = OnlineBatchServer(_cfg(), n_streams=2, params=params, callbacks=cbs1)
    for k in range(half):
        s1.push(np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios]))
    assert s1.pipelines[0].original_recorder.recording, (
        "checkpoint must land while a recording is in flight for this test "
        "to exercise recorder persistence"
    )
    s1.save_state(str(tmp_path / "ckpt"))
    seg_before = [list(s) for s in s1.segments]

    r2, cbs2 = collectors(2)
    s2 = OnlineBatchServer(_cfg(), n_streams=2, params=params, callbacks=cbs2)
    s2.load_state(str(tmp_path / "ckpt"))
    for k in range(half, n_chunks):
        s2.push(np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios]))

    resumed = [a + b for a, b in zip(seg_before, s2.segments)]
    assert resumed == ref.segments
    assert any(ref.segments), "test audio must produce segments"
    resumed_recs = [a + b for a, b in zip(r1, r2)]
    assert resumed_recs == ref_recs
    assert any(ref_recs), "test audio must produce recordings"


def test_push_routes_buffered_tails_through_the_ring(params):
    """Mixing push() with the ring-buffered path while a ring holds samples
    the device hasn't seen must NOT desynchronize recordings (ADVICE round
    1) — and a sub-chunk tail can never be drained by tick_pending alone,
    so push() routes such streams through the ring (chunk lands after the
    tail, the device serves the ring head) instead of refusing forever.
    Equivalence: a stream fed tail+pushes this way produces exactly the
    segments of the same audio fed purely via buffer_samples/tick."""
    n_chunks = 16
    audio = speechy(n_chunks, [(2.0, 2.0)], seed=11)
    tail = 5000  # sub-chunk ring residue before the first push

    mixed = OnlineBatchServer(_cfg(), n_streams=1, params=params)
    mixed.pipelines[0].buffer_samples(audio[:, :tail])
    for k in range(n_chunks - 1):  # push whole chunks offset by the tail
        a = audio[:, tail + k * 24000 : tail + (k + 1) * 24000]
        mixed.push(a[None])

    pure = OnlineBatchServer(_cfg(), n_streams=1, params=params)
    pure.pipelines[0].buffer_samples(audio[:, : tail + (n_chunks - 1) * 24000])
    while pure.tick_pending():
        pass

    assert mixed.segments == pure.segments
    assert any(mixed.segments), "test audio must produce segments"


def test_host_and_device_fsm_backends_agree(params):
    """Both FSM placements (host-C decoder vs in-device scan) produce the
    same segments; keeps the device path covered now that host is the
    single-process default."""
    n_chunks = 16
    audios = [
        speechy(n_chunks, [(2.0, 2.0)], seed=7),
        speechy(n_chunks, [(1.0, 1.5), (5.5, 1.5)], seed=8),
    ]

    servers = {
        mode: OnlineBatchServer(
            _cfg(), n_streams=2, params=params, use_host_fsm=mode
        )
        for mode in (True, False)
    }
    assert servers[True].use_host_fsm and not servers[False].use_host_fsm
    for k in range(n_chunks):
        chunks = np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios])
        for s in servers.values():
            s.push(chunks)

    assert servers[True].segments == servers[False].segments
    assert any(servers[True].segments), "test audio must produce segments"


def test_events_only_tier_matches_full(params):
    """collect_denoised=False (the events-only high-density serving tier)
    must produce identical segments and ORIGINAL recordings to the full
    tier — the denoised audio still feeds the device decision chain; only
    its host materialization is dropped. Denoised recordings don't fire and
    the denoised ring stays untouched."""
    from formula_vad_tpu.pipeline.pipeline import Callbacks

    n_chunks = 16
    audios = [
        speechy(n_chunks, [(2.0, 2.0)], seed=30),
        speechy(n_chunks, [(1.0, 1.5), (5.5, 1.5)], seed=31),
    ]

    def collectors(n):
        orig, den = [[] for _ in range(n)], [[] for _ in range(n)]
        cbs = [
            Callbacks(
                on_original_recording=lambda b, i=i: orig[i].append(
                    (b.global_start_frame_number, b.channel_pcm.tobytes())
                ),
                on_denoised_recording=lambda b, i=i: den[i].append(
                    b.global_start_frame_number
                ),
            )
            for i in range(n)
        ]
        return orig, den, cbs

    o_full, d_full, cb_full = collectors(2)
    full = OnlineBatchServer(_cfg(), n_streams=2, params=params, callbacks=cb_full)
    o_ev, d_ev, cb_ev = collectors(2)
    events = OnlineBatchServer(
        _cfg(), n_streams=2, params=params, callbacks=cb_ev, collect_denoised=False
    )
    for k in range(n_chunks):
        chunks = np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios])
        full.push(chunks)
        events.push(chunks)

    assert events.segments == full.segments
    assert any(full.segments), "test audio must produce segments"
    assert o_ev == o_full
    assert any(o_full), "test audio must produce original recordings"
    assert any(d_full), "full tier must produce denoised recordings"
    assert d_ev == [[], []], "events-only tier must not emit denoised recordings"
    for p in events.pipelines:
        assert p.denoised_ring.total_written == 0
        assert not p.denoised_recorder.recording


def test_shared_fill_fast_path_bitwise(params):
    """The lockstep shared-start framing (one unbatched slice offset) must
    be BITWISE identical to the per-stream form — same segments, same
    min_vol stream — and must actually engage in lockstep while falling
    back cleanly when valid-mask freezes desynchronize the fills."""
    n_chunks = 12
    audios = [
        speechy(n_chunks, [(2.0, 2.0)], seed=40),
        speechy(n_chunks, [(1.0, 1.5)], seed=41),
    ]

    shared = OnlineBatchServer(_cfg(), n_streams=2, params=params)
    plain = OnlineBatchServer(
        _cfg(), n_streams=2, params=params, use_shared_fill=False
    )
    assert shared._use_shared_fill and not plain._use_shared_fill
    for k in range(n_chunks):
        chunks = np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios])
        shared.push(chunks)
        plain.push(chunks)
    assert shared.segments == plain.segments
    assert any(shared.segments), "test audio must produce segments"
    # Carries bitwise equal after the whole run (the slice reads the same
    # samples, so every downstream value matches exactly).
    import jax as _jax

    for a, b in zip(
        _jax.tree_util.tree_leaves(shared._carries),
        _jax.tree_util.tree_leaves(plain._carries),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Desynchronize: stream 0 idles one tick, fills diverge -> fallback
    # path must engage (fills no longer all equal) and stay correct.
    extra = speechy(2, [(0.2, 0.5)], seed=42)
    shared.push(
        np.stack([np.zeros((2, 24000), np.float32), extra[:, :24000]]),
        valid=np.array([False, True]),
    )
    assert shared._fills[0] != shared._fills[1]
    shared.push(np.stack([extra[:, :24000], extra[:, 24000:]]))


def test_int16_push_bitwise_matches_f32(params):
    """PCM16 ingestion: pushing the raw int16 batch (half the H2D bytes,
    device dequant) must be BITWISE identical to pushing the host-dequant
    f32 — segments, recordings, and final carries."""
    from formula_vad_tpu.pipeline.pipeline import Callbacks

    n_chunks = 16
    f32 = speechy(n_chunks, [(2.0, 2.0)], seed=50)
    q = np.clip(np.round(f32 * 32768.0), -32768, 32767).astype(np.int16)
    deq = q.astype(np.float32) / np.float32(32768.0)

    def collectors():
        recs = []
        cb = Callbacks(
            on_original_recording=lambda b: recs.append(
                (b.global_start_frame_number, b.channel_pcm.tobytes())
            )
        )
        return recs, [cb]

    r_i, cb_i = collectors()
    s_i = OnlineBatchServer(_cfg(), n_streams=1, params=params, callbacks=cb_i)
    r_f, cb_f = collectors()
    s_f = OnlineBatchServer(_cfg(), n_streams=1, params=params, callbacks=cb_f)
    for k in range(n_chunks):
        sl = slice(k * 24000, (k + 1) * 24000)
        s_i.push(q[None, :, sl])
        s_f.push(deq[None, :, sl])

    assert s_i.segments == s_f.segments
    assert any(s_i.segments), "test audio must produce segments"
    assert r_i == r_f
    assert r_i, "test audio must produce recordings"
    import jax as _jax

    for a, b in zip(
        _jax.tree_util.tree_leaves(s_i._carries),
        _jax.tree_util.tree_leaves(s_f._carries),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reset_stream_reassigns_slot(params):
    """reset_stream(i) must give slot i the exact fresh-stream state (its
    subsequent segments equal a brand-new solo pipeline on the new audio)
    while the other slots continue bitwise-undisturbed."""
    n_chunks = 16
    audio_a = speechy(n_chunks, [(2.0, 2.0)], seed=60)
    audio_b = speechy(n_chunks, [(3.0, 2.0)], seed=61)
    audio_c = speechy(2 * n_chunks, [(4.0, 2.0), (12.0, 2.0)], seed=62)

    server = OnlineBatchServer(_cfg(), n_streams=2, params=params)
    for k in range(n_chunks):
        server.push(np.stack([
            audio_a[:, k * 24000 : (k + 1) * 24000],
            audio_c[:, k * 24000 : (k + 1) * 24000],
        ]))
    assert server.pipelines[0].segments, "phase 1 must complete a segment"
    server.reset_stream(0)
    assert server.pipelines[0].segments == []
    for k in range(n_chunks):
        server.push(np.stack([
            audio_b[:, k * 24000 : (k + 1) * 24000],
            audio_c[:, (n_chunks + k) * 24000 : (n_chunks + k + 1) * 24000],
        ]))

    solo_b = AudioPipeline(_cfg(), params)
    solo_b.push_samples(audio_b)
    assert server.pipelines[0].segments == solo_b.segments
    assert solo_b.segments, "new audio must produce segments"

    solo_c = AudioPipeline(_cfg(), params)
    solo_c.push_samples(audio_c)
    assert server.pipelines[1].segments == solo_c.segments
    assert solo_c.segments, "continuing stream must produce segments"


def test_checkpoint_portable_across_fsm_backends(params, tmp_path):
    """A checkpoint saved by a host-FSM server resumes on a device-FSM
    server and vice versa (the host carry is folded back into the
    device-format carry on save; a device checkpoint converts on load),
    reproducing the uninterrupted run's segments."""
    n_chunks = 16
    audios = [speechy(n_chunks, [(2.0, 2.0)], seed=5),
              speechy(n_chunks, [(4.5, 2.0)], seed=6)]

    ref = OnlineBatchServer(_cfg(), n_streams=2, params=params)
    for k in range(n_chunks):
        ref.push(np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios]))

    half = n_chunks // 2
    for save_host, load_host in ((True, False), (False, True)):
        s1 = OnlineBatchServer(
            _cfg(), n_streams=2, params=params, use_host_fsm=save_host
        )
        for k in range(half):
            s1.push(np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios]))
        ckpt = str(tmp_path / f"ckpt_{save_host}")
        s1.save_state(ckpt)
        seg_before = [list(s) for s in s1.segments]

        s2 = OnlineBatchServer(
            _cfg(), n_streams=2, params=params, use_host_fsm=load_host
        )
        s2.load_state(ckpt)
        for k in range(half, n_chunks):
            s2.push(np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios]))
        resumed = [a + b for a, b in zip(seg_before, s2.segments)]
        assert resumed == ref.segments, (save_host, load_host)
    assert any(ref.segments)


def test_microbatch_matches_single_dispatch(params, tmp_path):
    """microbatch=2 must reproduce microbatch=1 exactly — vmapped rows are
    independent and per-row programs identical (parallel/online.py
    microbatch notes) — including reset_stream in the SECOND shard and a
    checkpoint saved at one microbatch factor resumed at another."""
    n_chunks = 12
    audios = [speechy(n_chunks, [(1.0 + 0.5 * i, 1.5)], seed=70 + i) for i in range(4)]

    def chunk_at(k):
        return np.stack([a[:, k * 24000 : (k + 1) * 24000] for a in audios])

    ref = OnlineBatchServer(_cfg(), n_streams=4, params=params)
    mb = OnlineBatchServer(_cfg(), n_streams=4, params=params, microbatch=2)
    half = n_chunks // 2
    for k in range(half):
        ref.push(chunk_at(k))
        mb.push(chunk_at(k))

    # Checkpoint portability across factors: save at m=2, resume at m=1.
    ckpt = str(tmp_path / "mb_ckpt")
    mb.save_state(ckpt)
    resumed = OnlineBatchServer(_cfg(), n_streams=4, params=params)
    resumed.load_state(ckpt)
    seg_before = [list(s) for s in mb.segments]

    # Slot 3 lives in shard 1 (rows 2-3): reset must hit the right row.
    fresh = speechy(n_chunks - half, [(0.5, 1.5)], seed=99)
    ref.reset_stream(3)
    mb.reset_stream(3)
    for k in range(half, n_chunks):
        c = chunk_at(k)
        c[3] = fresh[:, (k - half) * 24000 : (k - half + 1) * 24000]
        ref.push(c)
        mb.push(c)
        resumed.push(chunk_at(k))

    assert mb.segments == ref.segments
    assert any(ref.segments), "test audio must produce segments"
    solo3 = AudioPipeline(_cfg(), params)
    solo3.push_samples(fresh)
    assert mb.pipelines[3].segments == solo3.segments

    # The m=1 server resumed from the m=2 checkpoint matches an
    # uninterrupted run (no reset on this pair).
    unint = OnlineBatchServer(_cfg(), n_streams=4, params=params)
    for k in range(n_chunks):
        unint.push(chunk_at(k))
    joined = [a + b for a, b in zip(seg_before, resumed.segments)]
    assert joined == unint.segments


def test_microbatch_validation(params):
    with pytest.raises(ValueError, match="multiple of"):
        OnlineBatchServer(_cfg(), n_streams=3, params=params, microbatch=2)


def test_checkpoint_stays_host_side(params):
    """The checkpoint path must never materialize a second full-B carry on
    device: ``_full_carries(host=True)`` (what save_state/load_state use)
    returns numpy leaves at every microbatch factor, so the microbatch>1
    HBM-capacity regime can checkpoint mid-serve without an OOM spike
    (parallel/online.py _full_carries note)."""
    import jax

    audio = speechy(1, [(0.1, 0.3)], seed=7)
    for m in (1, 2):
        srv = OnlineBatchServer(_cfg(), n_streams=4, params=params, microbatch=m)
        srv.push(np.stack([audio] * 4))
        full = srv._full_carries(host=True)
        bad = [
            type(leaf).__name__
            for leaf in jax.tree_util.tree_leaves(full)
            if not isinstance(leaf, (np.ndarray, np.generic))
        ]
        assert not bad, f"microbatch={m}: non-host leaves {bad}"
        # The device form is unchanged by the host fetch.
        dev = srv._full_carries()
        for a, b in zip(
            jax.tree_util.tree_leaves(full), jax.tree_util.tree_leaves(dev)
        ):
            assert np.array_equal(a, np.asarray(b))


def test_tick_stats_counters(params):
    """tick_stats: empty before any tick; over_budget counts ticks past the
    chunk's real-time budget (injected latencies — no device timing here)."""
    server = OnlineBatchServer(_cfg(), n_streams=2, params=params)
    s0 = server.tick_stats()
    assert s0["ticks"] == 0 and s0["window"] == 0 and "last_ms" not in s0
    assert s0["budget_ms"] == 1e3 * server.chunk_size / server.config.sample_rate

    server._tick_times.extend([0.010, 0.020, 0.700])  # 10/20/700 ms
    server._ticks_total = 3
    s = server.tick_stats()
    assert s["ticks"] == 3 and s["window"] == 3
    assert s["last_ms"] == 700.0 and s["max_ms"] == 700.0
    assert s["p50_ms"] == 20.0
    assert s["over_budget"] == 1  # only the 700 ms tick breaches 500 ms
