"""Online multi-stream serving: one batched device step for N live streams.

The reference serves exactly one radio stream per daemon process
(src/main.zig); scaling to a race weekend means a process per driver and no
MXU amortization. This server holds B carried VAD states on device and runs
ONE vmapped (optionally mesh-sharded) ``chunk_step`` per 0.5 s tick for all
streams in lockstep — the production serving shape: device time per tick is
nearly flat in B (the matmuls batch), while recordings, segment assembly,
callbacks, and checkpointing stay per-stream host objects (the full
``AudioPipeline`` feature set via ``ingest_processed_chunk``).

Streams without data this tick pass ``valid=False``: their carried state is
FROZEN on device (`jnp.where` on the carry), unlike the reference's
``skip_segment`` which pushes silence through the whole pipeline — freezing
neither decays the rolling noise floor nor advances window indices, so a
stream resumes exactly where it left off. (Push explicit zeros instead if
silence-advance semantics are wanted; that matches the reference.)
"""

from __future__ import annotations

import collections
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..models import nsnet2
from ..pipeline import vad
from ..pipeline.pipeline import AudioPipeline, Callbacks
from . import mesh as mesh_lib


class OnlineBatchServer:
    """Lockstep online VAD over B streams with one batched device step."""

    def __init__(
        self,
        config: PipelineConfig,
        n_streams: int,
        params: Optional[nsnet2.NSNet2Params] = None,
        callbacks: Optional[Sequence[Optional[Callbacks]]] = None,
        mesh=None,
        use_mesh: bool = False,
        use_host_fsm: bool | None = None,
        collect_denoised: bool = True,
        use_shared_fill: bool = True,
        microbatch: int = 1,
    ):
        """collect_denoised=False is the events-only serving tier: the
        denoised batch ([B, C, chunk] f32 — ~1.8 GB on device plus the same
        D2H per tick at B=9216) never leaves the device. Decisions, segments,
        callbacks and ORIGINAL recordings are unchanged; denoised recordings
        are unavailable (vad.chunk_step docstring). Use it when serving VAD
        events at maximum stream density rather than clip extraction.

        microbatch=m splits each tick into m sequential shard dispatches of
        B/m streams: per-stream carries stay resident, but the step's
        TRANSIENT activations (the HBM-capacity binder past ~14k streams —
        STATUS round-3 item 12) shrink by m. Per-row math is unchanged —
        vmapped rows are independent and MXU contraction order is
        row-count-independent (the pipeline_ab gate premise) — so outputs
        are expected bitwise-identical to microbatch=1; shard k+1's compute
        overlaps shard k's async D2H. Time is ~linear in B at these scales,
        so m trades nothing but a few dispatch round trips for capacity."""
        if params is None:
            from ..models.registry import load_denoiser

            params = load_denoiser(config.vad_config.denoiser_model_path)
        self.params = params
        self.config = config
        self.n_streams = n_streams
        cbs = list(callbacks) if callbacks is not None else [None] * n_streams
        if len(cbs) != n_streams:
            raise ValueError("callbacks must have one entry per stream")
        self.st = vad.statics_from_config(
            config.vad_config, config.sample_rate, config.n_channels
        )
        self.pipelines = [
            AudioPipeline(config, params, cb, statics=self.st, server_managed=True)
            for cb in cbs
        ]
        self.chunk_size = self.st.chunk_size
        if microbatch < 1 or n_streams % microbatch:
            raise ValueError(
                f"n_streams={n_streams} must be a positive multiple of "
                f"microbatch={microbatch}"
            )
        self.microbatch = microbatch
        self._shard = n_streams // microbatch
        self.mesh = mesh if mesh is not None else (
            mesh_lib.data_mesh() if use_mesh else None
        )
        if self.mesh is not None:
            n_dev = int(np.prod(list(self.mesh.shape.values())))
            if self._shard % n_dev:
                raise ValueError(
                    f"microbatch shard {self._shard} must be divisible by the "
                    f"mesh's {n_dev} devices (pad with always-invalid streams)"
                )

        st = self.st
        b = n_streams

        if use_host_fsm is None:
            # Default: decode the FSM on the host (native/fvadfsm.cpp) from
            # the window inputs the server already fetches each tick with
            # the denoised audio (~1-2 ms in native code). The in-device
            # alternative pays the vmapped scan's full-ring re-sums and
            # per-push scatters every window for every stream on top of the
            # front-end (measured tick decomposition: ROOFLINE.md "online
            # tick").
            from ..pipeline import fsm_host

            use_host_fsm = fsm_host.available() and jax.process_count() == 1
        self.use_host_fsm = use_host_fsm
        run_fsm = not use_host_fsm

        self.collect_denoised = collect_denoised

        def dequant(chunks):
            if chunks.dtype == jnp.int16:
                # Raw PCM16 shipped at half the H2D bytes; exact in f32
                # (16-bit int, power-of-two divide) so it is bit-identical
                # to host-side dequant (same convention as the offline
                # raw16 slab path, parallel/slab_runner.py).
                return chunks.astype(jnp.float32) / np.float32(32768.0)
            return chunks

        def batched_step(carries, chunks, valid):
            # chunk_step's own chunk_valid path freezes the carry of invalid
            # streams (the canonical ragged-batch semantics, vad.py) — their
            # outputs are ignored on the host side.
            chunks = dequant(chunks)
            return jax.vmap(
                lambda c, a, v: vad.chunk_step(
                    params, st, c, a, chunk_valid=v, run_fsm=run_fsm,
                    collect_denoised=collect_denoised,
                )
            )(carries, chunks, valid)

        def batched_step_shared(carries, chunks, valid, start):
            # Lockstep fast path: every valid stream shares one window-fill
            # phase, so the framing slice offset enters UNBATCHED and lowers
            # to one contiguous slice instead of a per-row gather (measured
            # 7.7 → ~4.6 ms of the B=1024 tick, benchmarks/tick_bisect.py).
            # Invalid streams' frames are garbage under the shared start —
            # exactly like their zero-pushed chunks: outputs masked, carry
            # frozen (vad.chunk_step), so results are bitwise-identical.
            chunks = dequant(chunks)
            return jax.vmap(
                lambda c, a, v: vad.chunk_step(
                    params, st, c, a, chunk_valid=v, run_fsm=run_fsm,
                    collect_denoised=collect_denoised, shared_start=start,
                )
            )(carries, chunks, valid)

        # Donate the carries: the server overwrites self._carries with the
        # step's result every tick, so the old buffers are dead — donation
        # lets XLA reuse them in place (saves a carry-sized allocation,
        # ~219 MB at B=4608). CPU lacks donation and warns, so gate it.
        donate = (0,) if jax.default_backend() != "cpu" else ()
        if self.mesh is not None:
            sh = mesh_lib.batch_sharding(self.mesh)
            rep = mesh_lib.replicated(self.mesh)
            self._step = jax.jit(
                batched_step, in_shardings=(sh, sh, sh), donate_argnums=donate
            )
            self._step_shared = jax.jit(
                batched_step_shared,
                in_shardings=(sh, sh, sh, rep),
                donate_argnums=donate,
            )
        else:
            self._step = jax.jit(batched_step, donate_argnums=donate)
            self._step_shared = jax.jit(batched_step_shared, donate_argnums=donate)
        # Host-tracked window-fill phases (deterministic: fill' =
        # (fill + chunk) mod fft for each valid tick) select the shared-
        # start program whenever all live fills agree — true from t=0 in
        # lockstep serving until valid-mask freezes desynchronize streams.
        self._fills = np.zeros(b, np.int64)
        self._use_shared_fill = use_shared_fill
        # Tick-latency observability (runtime-only; not checkpointed).
        self._tick_times: collections.deque = collections.deque(maxlen=512)
        self._ticks_total = 0
        self._reset_fn = None  # lazily-jitted row reset (reset_stream)
        # One carry pytree per microbatch shard (len 1 when microbatch=1);
        # shards never move after init — only their leaves are replaced.
        self._carries = [
            jax.vmap(lambda _: vad.init_carry(st))(jnp.arange(self._shard))
            for _ in range(microbatch)
        ]
        self._host_fsm_carry = None
        if use_host_fsm:
            from ..pipeline import fsm_host

            self._host_fsm_carry = fsm_host.init_host_carry(
                st.fsm_shape, st.fsm_params, b
            )

    def reset_stream(self, i: int, callbacks=None) -> None:
        """Reassign slot ``i`` to a fresh stream without touching the fleet.

        Production serving rotates radios through a fixed-B server: when a
        stream ends, its slot is reset in place — device carry row, host
        FSM row, fill phase, and the host pipeline (rings, recorders,
        counters, segments) all return to the fresh-stream state; every
        other slot is bitwise untouched (row-masked ``jnp.where`` on
        device, no D2H round trip of the batched carry). The reference
        would restart a daemon process here (main.zig). The new stream
        starts at window-fill 0, so the shared-fill fast path re-engages
        once its phase realigns with the fleet (or immediately if the
        fleet resets together); until then ticks use the per-stream form.

        callbacks: new Callbacks for the slot (default: keep the old ones).
        """
        if not 0 <= i < self.n_streams:
            raise ValueError(f"stream index {i} out of range [0, {self.n_streams})")
        if self._reset_fn is None:
            donate = (0,) if jax.default_backend() != "cpu" else ()

            def reset_rows(carries, init_single, mask):
                def upd(all_, one):
                    m = mask.reshape((-1,) + (1,) * (all_.ndim - 1))
                    return jnp.where(m, one[None].astype(all_.dtype), all_)

                return jax.tree_util.tree_map(upd, carries, init_single)

            self._reset_fn = jax.jit(reset_rows, donate_argnums=donate)
        s, r = divmod(i, self._shard)
        mask = np.zeros(self._shard, bool)
        mask[r] = True
        self._carries[s] = self._reset_fn(
            self._carries[s], vad.init_carry(self.st), jnp.asarray(mask)
        )
        if self._host_fsm_carry is not None:
            from ..pipeline import fsm_host

            one = fsm_host.init_host_carry(self.st.fsm_shape, self.st.fsm_params, 1)
            for k, v in one.items():
                self._host_fsm_carry[k][i] = v[0]
        self._fills[i] = 0
        cb = callbacks if callbacks is not None else self.pipelines[i].callbacks
        self.pipelines[i] = AudioPipeline(
            self.config, self.params, cb, statics=self.st, server_managed=True
        )

    def _run_step(self, chunks_host: np.ndarray, valid_np: np.ndarray):
        """Dispatch one tick as ``microbatch`` sequential shard steps (one
        when microbatch=1), picking the shared-fill fast path when every
        valid stream's window-fill phase agrees (host-tracked; the shared
        start is fleet-global, so the choice is made once per tick).
        Returns the tick output as HOST arrays with the host-FSM windows
        already decoded and spliced in — each shard's async D2H is started
        at dispatch, so shard k's fetch overlaps shard k+1's compute, and
        in host-FSM mode shard k's FSM decode runs on the host WHILE the
        device executes shards k+1.. (``device_get(outs[k])`` blocks on
        shard k only; decode order per stream is unchanged, so outputs are
        identical to a post-hoc batched decode — at microbatch=m all but
        the last shard's decode hides behind device compute)."""
        t0 = time.perf_counter()
        live = self._fills[valid_np]
        shared = self._use_shared_fill and live.size and (live == live[0]).all()
        start = (
            jnp.int32(self.st.fft_size - int(live[0])) if shared else None
        )
        sh = self._shard
        outs = []
        for s in range(self.microbatch):
            rows = slice(s * sh, (s + 1) * sh)
            ck = jnp.asarray(chunks_host[rows])
            va = jnp.asarray(valid_np[rows])
            if shared:
                self._carries[s], out_s = self._step_shared(
                    self._carries[s], ck, va, start
                )
            else:
                self._carries[s], out_s = self._step(self._carries[s], ck, va)
            outs.append(self._start_fetch(out_s))
        self._fills[valid_np] = (
            self._fills[valid_np] + self.chunk_size
        ) % self.st.fft_size
        host = [
            self._decode_shard(jax.device_get(o), s) for s, o in enumerate(outs)
        ]
        if self.microbatch == 1:
            result = host[0]
        else:
            result = jax.tree_util.tree_map(
                lambda *xs: np.concatenate(xs, axis=0), *host
            )
        # Everything device-side is materialized on host here, so this wall
        # time is a true tick latency (dispatch + compute + D2H + FSM decode).
        self._tick_times.append(time.perf_counter() - t0)
        self._ticks_total += 1
        return result

    def _decode_shard(self, out, s: int):
        """Host-FSM mode: decode shard ``s``'s window inputs and splice the
        WindowOutput into its (device-FSM-free) ChunkOutput. The shard's
        rows of the host carry are passed as numpy VIEWS, so the native
        decoder's in-place update lands directly in the full-fleet carry
        (checkpoints and reset_stream keep seeing one [B, ...] array)."""
        if not self.use_host_fsm:
            return out
        from ..pipeline import fsm_host

        rows = slice(s * self._shard, (s + 1) * self._shard)
        carry_view = {k: v[rows] for k, v in self._host_fsm_carry.items()}
        win_out, new_carry = fsm_host.scan_windows_host(
            self.st.fsm_shape, self.st.fsm_params,
            np.asarray(out.min_vol), np.asarray(out.ratios),
            np.asarray(out.window_valid),
            carry=carry_view,
            win_base=np.asarray(out.win_indices)[:, 0],
            return_carry=True,
        )
        # The decoder updates the RING buffers in place (through the views)
        # but returns the scalar registers as FRESH arrays bound into the
        # passed dict — which here is the temporary view dict. Write every
        # entry back into the fleet carry's rows (ring entries are self-
        # assignments of the same memory; scalars are the real update).
        for k, v in new_carry.items():
            self._host_fsm_carry[k][rows] = v
        return out._replace(windows=win_out)

    @staticmethod
    def _start_fetch(out):
        """Start async D2H copies on every tick output at DISPATCH time.

        ``_step`` returns futures; enqueueing the copies immediately lets the
        runtime stream results (the big ``denoised`` batch in particular)
        while the device is still computing the step, instead of paying a
        serial fetch afterwards — the same measured ~8x end-to-end win as
        the offline host-FSM path (benchmarks/host_fsm_ab.py, verify skill
        D2H notes). Harmless on real hosts (copies overlap PCIe with
        compute) and a no-op on backends without the method."""
        for leaf in jax.tree_util.tree_leaves(out):
            try:
                leaf.copy_to_host_async()
            except AttributeError:
                pass
        return out

    def push(
        self, chunks: np.ndarray, valid: Optional[np.ndarray] = None
    ) -> None:
        """Advance every valid stream by one chunk.

        Args:
          chunks: [B, C, chunk_size] float32 (rows of invalid streams are
            ignored; pass zeros).
          valid: [B] bool mask; default all true.

        Transfer note: each tick moves the chunk batch H2D and the denoised
        batch D2H (~192 KB/stream each way per 0.5 s) — the host pipelines
        need the denoised audio for recordings. ~0.8 GB/s of PCIe at the
        2,000-stream scale; well within a real host NIC/PCIe budget, but the
        dominant cost through a tunneled development chip. PCM16 sources
        may pass an ``int16`` batch instead: it ships raw at HALF the H2D
        bytes and dequantizes on device bit-identically to host decode
        (i/32768 is exact in f32 — the offline raw16 convention); rings and
        recordings hold the identically-dequantized f32 samples.
        """
        chunks = np.asarray(chunks)
        if chunks.dtype != np.int16:
            chunks = np.asarray(chunks, np.float32)
        if chunks.shape != (self.n_streams, self.config.n_channels, self.chunk_size):
            raise ValueError(
                f"expected chunks of shape "
                f"{(self.n_streams, self.config.n_channels, self.chunk_size)}, "
                f"got {chunks.shape}"
            )
        i16 = chunks.dtype == np.int16
        host_chunks = (
            chunks.astype(np.float32) / np.float32(32768.0) if i16 else chunks
        )
        if valid is None:
            valid = np.ones((self.n_streams,), bool)
        valid = np.asarray(valid, bool)
        if valid.shape != (self.n_streams,):
            raise ValueError(
                f"valid mask must have shape ({self.n_streams},), got {valid.shape}"
            )
        # Streams whose ring holds unprocessed samples (a caller mixed
        # buffer_samples() with push(), e.g. a sub-chunk tail that
        # tick_pending can never drain alone) are routed THROUGH the ring:
        # the pushed chunk lands after the buffered tail and the device
        # serves the ring head, preserving sample order exactly — directly
        # ingesting would advance the read count past samples the device
        # never saw and silently desynchronize recordings.
        ring_routed = np.zeros(self.n_streams, bool)
        for i, p in enumerate(self.pipelines):
            if not valid[i]:
                continue
            if p.original_ring.total_written != p._read_count:
                ring_routed[i] = True
                p.buffer_samples(host_chunks[i])
        if i16 and not ring_routed.any():
            dev_chunks = chunks  # raw int16, half the H2D bytes
        else:
            # Ring-routed rows come back from the ring as f32; the device
            # batch must be one dtype, so such (rare, mixed-ingestion)
            # ticks upload the exactly-dequantized f32 — bit-identical,
            # just without the bandwidth saving.
            dev_chunks = np.array(host_chunks)
            for i in np.nonzero(ring_routed)[0]:
                # residue > 0 plus a full chunk always yields >= 1 pending
                dev_chunks[i] = self.pipelines[i].peek_pending_chunk()
        out = self._run_step(np.asarray(dev_chunks), valid)
        for i in range(self.n_streams):
            if not valid[i]:
                continue
            out_i = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], out)
            if ring_routed[i]:
                self.pipelines[i].complete_chunk(out_i)
            else:
                self.pipelines[i].ingest_processed_chunk(host_chunks[i], out_i)

    def tick_pending(self) -> bool:
        """Advance every stream holding >= one full chunk in its ring.

        The ring-buffered companion to ``push``: callers feed audio through
        ``pipeline.buffer_samples`` (which, like the solo path, lands every
        sample — sub-chunk tails included — in the ring immediately, so
        deferred recordings finalize exactly as a solo daemon's would), and
        this drains full chunks through one batched device step. Returns
        False when no stream had a full chunk.
        """
        valid = np.array([p.pending_chunks >= 1 for p in self.pipelines])
        if not valid.any():
            return False
        zeros = np.zeros((self.config.n_channels, self.chunk_size), np.float32)
        chunks = np.stack(
            [
                p.peek_pending_chunk() if v else zeros
                for p, v in zip(self.pipelines, valid)
            ]
        )
        out = self._run_step(chunks, valid)
        for i, p in enumerate(self.pipelines):
            if valid[i]:
                p.complete_chunk(jax.tree_util.tree_map(lambda x: np.asarray(x)[i], out))
        return True

    @property
    def segments(self) -> list[list[dict]]:
        return [p.segments for p in self.pipelines]

    def tick_stats(self) -> dict:
        """Latency of recent ticks vs the real-time budget.

        Wall time per tick (dispatch + device compute + D2H + host-FSM
        decode — everything up to host-materialized outputs) over the last
        <=512 ticks. Runtime-only: survives checkpoints as fresh counters,
        so restored fleets report their own process's latencies.
        """
        budget_ms = 1e3 * self.chunk_size / self.config.sample_rate
        stats = {
            "ticks": self._ticks_total,
            "window": len(self._tick_times),
            "budget_ms": float(budget_ms),
            "streams": self.n_streams,
        }
        if self._tick_times:
            ts = np.asarray(self._tick_times, np.float64) * 1e3
            stats.update(
                last_ms=round(float(ts[-1]), 3),
                p50_ms=round(float(np.percentile(ts, 50)), 3),
                p95_ms=round(float(np.percentile(ts, 95)), 3),
                max_ms=round(float(ts.max()), 3),
                over_budget=int(np.sum(ts > budget_ms)),
            )
        return stats

    # ---- checkpoint / resume (serving failover) ---------------------------

    def save_state(self, directory: str) -> None:
        """Persist the batched device carries + every stream's host state so
        a restarted server resumes all B streams bit-identically."""
        import os

        from ..utils import checkpoint

        os.makedirs(directory, exist_ok=True)
        carries = self._full_carries(host=True)
        if self._host_fsm_carry is not None:
            # Host-FSM mode: the authoritative FSM state lives host-side
            # (the device carry's fsm slot is frozen at init). Fold it back
            # into the device-format carry so the checkpoint is portable to
            # a device-FSM server too, and save the exact host form (incl.
            # the Kahan running sums) alongside.
            fsm_sub = {
                k: np.asarray(v)
                for k, v in self._host_fsm_carry.items()
                if not k.startswith("_")
            }
            carries = {**carries, "fsm": fsm_sub}
            np.savez(
                os.path.join(directory, "host_fsm.npz"), **self._host_fsm_carry
            )
        checkpoint.save_carry(os.path.join(directory, "carries.npz"), carries)
        for i, p in enumerate(self.pipelines):
            # Per-stream host state (rings/counters); the per-pipeline carry
            # inside this file is unused in server mode (the batched carries
            # file above is authoritative).
            p.save_state(os.path.join(directory, f"stream{i:04d}.npz"))

    def _full_carries(self, host: bool = False):
        """The batched [B, ...] carry pytree (concatenating microbatch
        shards when there are several — checkpoints stay microbatch-
        portable: save at m=4, resume at m=1, and vice versa).

        ``host=True`` fetches each shard with ``device_get`` and
        concatenates in host memory: at microbatch>1 a device-side concat
        would transiently hold a SECOND full-size carry copy in HBM —
        exactly the capacity-bound regime microbatch exists to serve, where
        a mid-serve checkpoint must not be able to OOM the fleet."""
        if self.microbatch == 1:
            return jax.device_get(self._carries[0]) if host else self._carries[0]
        if host:
            shards = [jax.device_get(c) for c in self._carries]
            return jax.tree_util.tree_map(
                lambda *xs: np.concatenate(xs, axis=0), *shards
            )
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *self._carries
        )

    def _set_full_carries(self, carries) -> None:
        # Slice on host (numpy views are free), upload per shard — the
        # device never holds more than one bounded shard in flight beyond
        # the resident carries being replaced.
        sh = self._shard
        self._carries = [
            jax.device_put(
                jax.tree_util.tree_map(
                    lambda x: x[s * sh : (s + 1) * sh], carries
                )
            )
            for s in range(self.microbatch)
        ]

    def load_state(self, directory: str) -> None:
        import os

        from ..utils import checkpoint

        # Host template: restored leaves stay numpy, so the full-B carry is
        # never materialized on device — _set_full_carries uploads bounded
        # shard slices (see _full_carries note on the HBM-tight regime).
        full = checkpoint.load_carry(
            os.path.join(directory, "carries.npz"), self._full_carries(host=True)
        )
        self._set_full_carries(full)
        if self._host_fsm_carry is not None:
            path = os.path.join(directory, "host_fsm.npz")
            if os.path.exists(path):
                with np.load(path) as data:
                    self._host_fsm_carry = {
                        k: np.ascontiguousarray(data[k]) for k in data.files
                    }
            else:
                # Device-FSM-saved checkpoint: convert its fsm subtree
                # (host_carry seeds the Kahan sums exactly from the rings).
                from ..pipeline import fsm_host

                self._host_fsm_carry = fsm_host.host_carry(
                    self.st.fsm_shape, jax.device_get(full["fsm"])
                )
        for i, p in enumerate(self.pipelines):
            p.load_state(os.path.join(directory, f"stream{i:04d}.npz"))
        # Re-sync the host-tracked fill phases from the restored carries so
        # the shared-start dispatch stays exact across failover.
        self._fills = np.asarray(
            jax.device_get(full["fft_fill"]), np.int64
        )
