"""Batched multi-stream VAD runner.

Replaces the reference simulator's thread-per-recording model
(simulator.zig:221-232, one OS thread and one full pipeline per stream) with
the TPU-native formulation: all streams form a batch axis that is vmapped
inside one program and sharded across the device mesh with ``jit``; XLA
inserts any needed collectives (there are none on the hot path — streams are
independent, exactly why this maps so well to data parallelism).

Ragged stream lengths are handled by right-padding audio to a common chunk
count and masking padded chunks (the FSM carry freezes on invalid chunks, so
rolling averages and state are unaffected — SURVEY.md §7 "hard parts" #4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VADConfig, VADMachineConfig
from ..models import nsnet2
from ..pipeline import fsm, offline, vad
from . import mesh as mesh_lib


@dataclasses.dataclass
class StreamResult:
    """Per-stream result: list of segments (dicts with sample_from/sample_to/
    avg_channel_vol_ratio/vad_met_sec), plus per-alt-config segment lists."""

    segments: list[dict]
    alt_segments: list[list[dict]] = dataclasses.field(default_factory=list)


class BatchRunner:
    """Compile-once, run-many batched VAD over a device mesh."""

    def __init__(
        self,
        params: nsnet2.NSNet2Params,
        vad_config: VADConfig | None = None,
        n_channels: int = 2,
        sample_rate: int = 48000,
        mesh=None,
        use_mesh: bool = True,
        use_offline: bool = True,
        use_pallas_fsm: bool | None = None,
        use_host_fsm: bool | None = None,
    ):
        vad_config = vad_config or VADConfig()
        self.params = params
        self.use_offline = use_offline
        if use_host_fsm is None:
            # Default: decode the FSM on the host (native/fvadfsm.cpp) in
            # single-process runs — it removes the only serial stage from
            # the device step (f32 34.5->31.7 ms, bf16 14.4->11.6 ms at the
            # bench shape) and the [B, W] window-input fetch is tens of µs
            # on a real host (sub-call-overlapped via async copies even
            # through the dev relay tunnel — ROOFLINE.md,
            # benchmarks/host_fsm_ab.py). Multi-process runs keep the FSM
            # on device (outputs are sharded across hosts).
            from ..pipeline import fsm_host

            use_host_fsm = (
                use_offline
                and fsm_host.available()
                and jax.process_count() == 1
            )
        self.use_host_fsm = use_host_fsm and use_offline
        if use_pallas_fsm is None:
            # The Pallas kernel needs a real TPU backend; CPU runs (tests)
            # fall back to the vmapped lax.scan.
            use_pallas_fsm = jax.devices()[0].platform != "cpu"
        self.use_pallas_fsm = use_pallas_fsm
        self.st = vad.statics_from_config(vad_config, sample_rate, n_channels)
        self.alt_configs: Sequence[VADMachineConfig] = tuple(
            vad_config.alt_vad_machine_configs or ()
        )
        self.alt_params: Optional[fsm.FSMParams] = (
            vad.stack_machine_params(self.st, self.alt_configs) if self.alt_configs else None
        )
        self.mesh = mesh if mesh is not None else (mesh_lib.data_mesh() if use_mesh else None)
        self._fn = None

    # -- compiled batched function ------------------------------------------

    def _build(self):
        st = self.st
        params = self.params
        alt_params = self.alt_params

        if self.use_host_fsm:
            # Host-FSM path: the device computes ONLY the chunk-parallel
            # front-end; the serial FSM runs in native code on the host
            # from the fetched [B, W] window inputs (pipeline/fsm_host.py).
            def frontend_fn(audio, chunk_valids):
                n_valid = jnp.sum(chunk_valids.astype(jnp.int32), axis=1)
                return offline.window_inputs_batch(params, st, audio, n_valid)

            if self.mesh is not None:
                sh = mesh_lib.batch_sharding(self.mesh)
                return jax.jit(frontend_fn, in_shardings=(sh, sh))
            return jax.jit(frontend_fn)

        if self.use_offline:
            # Chunk-parallel path (pipeline/offline.py): batched front-end,
            # one FSM stage over [B, W] (Pallas kernel on TPU).
            use_pallas = self.use_pallas_fsm

            def batch_fn(audio, chunk_valids):
                n_valid = jnp.sum(chunk_valids.astype(jnp.int32), axis=1)
                win_out, valid = offline.process_batch_offline(
                    params, st, audio, n_valid, use_pallas_fsm=use_pallas
                )
                outs = vad.ChunkOutput(windows=win_out, window_valid=valid, denoised=None)
                alt_outs = None
                if alt_params is not None:
                    alt_win, alt_valid = offline.process_batch_offline(
                        params, st, audio, n_valid,
                        fsm_params=alt_params, use_pallas_fsm=False,
                    )
                    alt_outs = vad.ChunkOutput(
                        windows=alt_win, window_valid=alt_valid, denoised=None
                    )
                return outs, alt_outs

            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P

                fn = jax.shard_map(
                    batch_fn,
                    mesh=self.mesh,
                    in_specs=(P("data"), P("data")),
                    out_specs=P("data"),
                    # pallas_call outputs don't carry vma annotations
                    check_vma=False,
                )
                return jax.jit(fn)
            return jax.jit(batch_fn)

        def one_stream(audio, chunk_valids):
            carry, outs = vad.process_stream(params, st, audio, chunk_valids=chunk_valids)
            alt_outs = None
            if alt_params is not None:
                _, alt_outs = vad.process_stream(
                    params, st, audio, chunk_valids=chunk_valids, fsm_params=alt_params
                )
            return outs, alt_outs

        fn = jax.vmap(one_stream)
        if self.mesh is not None:
            sh = mesh_lib.batch_sharding(self.mesh)
            fn = jax.jit(fn, in_shardings=(sh, sh))
        else:
            fn = jax.jit(fn)
        return fn

    def run(
        self, audio_batch: np.ndarray, lengths: Optional[Sequence[int]] = None
    ) -> list[StreamResult]:
        """Run the batched VAD.

        Args:
          audio_batch: [B, C, T] float32 (padded to common T).
          lengths: true per-stream sample counts (default: all T).
        Returns:
          one StreamResult per stream (padding streams excluded by caller).
        """
        b, c, t = audio_batch.shape
        chunk = self.st.chunk_size
        n_chunks = t // chunk
        if n_chunks == 0:
            return [StreamResult(segments=[]) for _ in range(b)]
        if lengths is None:
            lengths = [t] * b
        # Only full chunks are processed (VADPipeline.zig:149-151).
        valid_chunks = np.asarray([l // chunk for l in lengths], np.int32)
        chunk_valids = np.arange(n_chunks)[None, :] < valid_chunks[:, None]

        # Pad the batch to a multiple of the mesh data axis.
        b_pad = mesh_lib.pad_batch(b, self.mesh) if self.mesh is not None else b
        if b_pad != b:
            pad = b_pad - b
            audio_batch = np.concatenate(
                [audio_batch, np.zeros((pad, c, t), audio_batch.dtype)], axis=0
            )
            chunk_valids = np.concatenate([chunk_valids, np.zeros((pad, n_chunks), bool)], axis=0)

        if self._fn is None:
            self._fn = self._build()
        audio_np = audio_batch[:, :, : n_chunks * chunk]
        if self.use_host_fsm:
            if jax.process_count() > 1:
                raise ValueError(
                    "use_host_fsm requires a single process: multi-process "
                    "outputs are sharded across hosts (leave use_host_fsm "
                    "unset to get the device-FSM path automatically)"
                )
            return self._run_host_fsm(audio_np, chunk_valids, b)
        multiprocess = self.mesh is not None and jax.process_count() > 1
        if multiprocess:
            # Multi-host execution (BASELINE config 5): every process holds
            # the same full host batch; device_put extracts each process's
            # addressable shards, the jitted shard_map runs one SPMD program
            # over ICI+DCN, and the sharded outputs are allgathered so every
            # host can assemble the full segment lists.
            from jax.experimental import multihost_utils

            sh = mesh_lib.batch_sharding(self.mesh)
            # device_put straight from numpy: each process uploads only its
            # addressable shards (jnp.asarray first would materialize the
            # whole batch on one local device before redistributing).
            audio_dev = jax.device_put(audio_np, sh)
            cv_dev = jax.device_put(chunk_valids, sh)
            outs, alt_outs = self._fn(audio_dev, cv_dev)
            outs = multihost_utils.process_allgather(outs, tiled=True)
            alt_outs = (
                multihost_utils.process_allgather(alt_outs, tiled=True)
                if alt_outs is not None
                else None
            )
        else:
            outs, alt_outs = self._fn(jnp.asarray(audio_np), jnp.asarray(chunk_valids))
            outs = jax.device_get(outs)
            alt_outs = jax.device_get(alt_outs) if alt_outs is not None else None

        results = []
        for i in range(b):
            stream_out = jax.tree_util.tree_map(lambda x: x[i], outs)
            segs = vad.segments_from_outputs(self.st, stream_out)
            alt_segs = []
            if alt_outs is not None:
                for k in range(len(self.alt_configs)):
                    # FSM outputs carry the machine axis K last; window_valid
                    # and denoised don't (they're machine-independent).
                    alt_windows = jax.tree_util.tree_map(
                        lambda x: x[i][..., k], alt_outs.windows
                    )
                    alt_stream = vad.ChunkOutput(
                        windows=alt_windows, window_valid=None, denoised=None
                    )
                    alt_segs.append(vad.segments_from_outputs(self.st, alt_stream))
            results.append(StreamResult(segments=segs, alt_segments=alt_segs))
        return results[:b]

    def _run_host_fsm(self, audio_np, chunk_valids, b: int) -> list[StreamResult]:
        """Device front-end + native host FSM decode (single-process)."""
        from ..pipeline import fsm_host

        st = self.st
        mv, rt, va = self._fn(jnp.asarray(audio_np), jnp.asarray(chunk_valids))
        mv, rt, va = np.asarray(mv), np.asarray(rt), np.asarray(va)

        win_out = fsm_host.scan_windows_host(st.fsm_shape, st.fsm_params, mv, rt, va)
        alt_win = None
        n_alt = len(self.alt_configs)
        if n_alt:
            # (stream, machine) rows, b-major — per-row params like the
            # slab runner's alt path; outputs fold back to [B, W, K] to
            # match the device paths' machine-axis-last layout.
            rows = fsm_host.tile_param_rows(self.alt_params, mv.shape[0])
            alt_rows_out = fsm_host.scan_windows_host(
                st.fsm_shape, rows,
                np.repeat(mv, n_alt, axis=0),
                np.repeat(rt, n_alt, axis=0),
                np.repeat(va, n_alt, axis=0),
            )
            alt_win = jax.tree_util.tree_map(
                lambda x: np.moveaxis(
                    x.reshape((mv.shape[0], n_alt) + x.shape[1:]), 1, -1
                ),
                alt_rows_out,
            )

        results = []
        for i in range(b):
            stream_out = vad.ChunkOutput(
                windows=jax.tree_util.tree_map(lambda x: x[i], win_out),
                window_valid=va[i],
                denoised=None,
            )
            segs = vad.segments_from_outputs(st, stream_out)
            alt_segs = []
            if alt_win is not None:
                for k in range(n_alt):
                    alt_stream = vad.ChunkOutput(
                        windows=jax.tree_util.tree_map(
                            lambda x: x[i][..., k], alt_win
                        ),
                        window_valid=None,
                        denoised=None,
                    )
                    alt_segs.append(vad.segments_from_outputs(st, alt_stream))
            results.append(StreamResult(segments=segs, alt_segments=alt_segs))
        return results
