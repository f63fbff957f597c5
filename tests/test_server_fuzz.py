"""Randomized OnlineBatchServer lifecycle fuzz vs solo-pipeline oracles.

The per-feature server tests (test_online_server.py) pin each mechanism in
isolation; this fuzz interleaves ALL of them in one randomized run —
ragged valid masks (fill-phase desync: shared-start program on aligned
ticks, per-stream program after), partial-chunk `buffer_samples` feeds
(ring routing), in-place `reset_stream` slot rotation, and checkpoint
save/load across DIFFERENT microbatch factors — asserting at every
quiesce point that each slot's segments are exactly what a solo
``AudioPipeline`` fed the identical sample stream produces. This is where
cross-feature state bugs would live (fill tracking across reset/reload,
ring residue across checkpoints, microbatch shard math after rotation).
"""

import numpy as np
import pytest

from formula_vad_tpu.config import PipelineConfig, VADConfig, VADMachineConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.parallel.online import OnlineBatchServer
from formula_vad_tpu.pipeline.pipeline import AudioPipeline

CHUNK = 24000
N = 3


@pytest.fixture(scope="module")
def params():
    import jax

    return nsnet2.init_params(jax.random.PRNGKey(42))


def _cfg():
    return PipelineConfig(
        vad_config=VADConfig(
            vad_machine_config=VADMachineConfig(long_term_speech_avg_sec=10.0)
        )
    )


def _stream(seed, n_chunks=24):
    """A long speech-burst stream the fuzz consumes chunk by chunk."""
    rng = np.random.default_rng(seed)
    t_total = n_chunks * CHUNK
    t = np.arange(t_total) / 48000.0
    base = 0.003 * rng.standard_normal((2, t_total)).astype(np.float32)
    env = np.zeros(t_total, np.float32)
    pos = 1.0
    while pos < n_chunks * 0.5 - 2:
        dur = float(rng.uniform(0.8, 2.5))
        env[int(pos * 48000) : int((pos + dur) * 48000)] = 1.0
        pos += dur + float(rng.uniform(1.0, 3.0))
    sp = (0.25 * np.sin(2 * np.pi * 700 * t) + 0.15 * np.sin(2 * np.pi * 1300 * t)) * env
    return base + np.stack([sp, 0.9 * sp.astype(np.float32)]).astype(np.float32)


class Slot:
    """One server slot's oracle: a solo pipeline fed the identical samples."""

    def __init__(self, params, seed):
        self.oracle = AudioPipeline(_cfg(), params)
        self.stream = _stream(seed)
        self.consumed = 0  # samples handed to BOTH server and oracle

    def next_samples(self, n):
        s = self.stream[:, self.consumed : self.consumed + n]
        if s.shape[1] < n:  # loop the stream source
            reps = [s] + [self.stream] * (1 + n // self.stream.shape[1])
            s = np.concatenate(reps, axis=1)[:, :n]
        self.consumed += n
        return s


def test_lifecycle_fuzz(params, tmp_path):
    rng = np.random.default_rng(1234)
    server = OnlineBatchServer(_cfg(), n_streams=N, params=params, microbatch=1)
    slots = [Slot(params, seed=100 + i) for i in range(N)]
    checks = 0

    def drain():
        while server.tick_pending():
            pass

    def quiesce_and_check():
        nonlocal checks
        drain()
        for i in range(N):
            assert server.pipelines[i].segments == slots[i].oracle.segments, (
                f"slot {i} diverged from its solo oracle"
            )
            checks += 1

    n_resets = 0
    for tick in range(16):
        action = rng.random()
        if (tick == 6 or (action < 0.12 and tick > 2)) and n_resets < 2:
            # In-place slot rotation: compare, then swap in a fresh stream.
            # (tick 6 fires deterministically so every fuzz run exercises
            # rotation at least once; rng adds more.)
            quiesce_and_check()
            i = int(rng.integers(N))
            server.reset_stream(i)
            slots[i] = Slot(params, seed=1000 + tick)
            n_resets += 1  # capped: non-reset slots must reach their
            # stream's end so at least one segment FINALIZES (solo streams
            # finalize around chunk 19-23)
        elif tick == 10 or (action < 0.24 and tick > 1):
            # Failover: checkpoint, rebuild at a different microbatch, load.
            d = str(tmp_path / f"ckpt{tick}")
            server.save_state(d)
            m = int(rng.choice([1, 3]))
            server = OnlineBatchServer(
                _cfg(), n_streams=N, params=params, microbatch=m
            )
            server.load_state(d)

        valid = rng.random(N) < 0.75
        if not valid.any():
            valid[int(rng.integers(N))] = True
        chunks = np.zeros((N, 2, CHUNK), np.float32)
        for i in range(N):
            if not valid[i]:
                continue
            if rng.random() < 0.2:
                # Partial feed: half a chunk through the ring, then the
                # push routes this tick's full chunk behind it.
                half = slots[i].next_samples(CHUNK // 2)
                server.pipelines[i].buffer_samples(half)
                slots[i].oracle.push_samples(half)
            chunks[i] = slots[i].next_samples(CHUNK)
            slots[i].oracle.push_samples(chunks[i])
        server.push(chunks, valid=valid)

    # Tail: all-valid ticks so every never-reset slot consumes its full
    # stream (trailing silence exceeds max_gap) and in-progress speech runs
    # FINALIZE into segments before the last check.
    for _ in range(11):
        chunks = np.stack([s.next_samples(CHUNK) for s in slots])
        for i in range(N):
            slots[i].oracle.push_samples(chunks[i])
        server.push(chunks)

    quiesce_and_check()
    assert checks >= 2 * N, "fuzz must reach multiple quiesce points"
    assert any(p.segments for p in server.pipelines), (
        "fuzz audio must produce at least one segment"
    )
