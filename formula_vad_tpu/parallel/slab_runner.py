"""Slab-wise batched VAD for arbitrarily long streams.

The one-shot offline path (``offline.process_batch_offline``) materializes
whole streams on device — perfect for minutes of audio, impossible for a
21-stream hour-long race (~58 GB > HBM).  This runner processes the batch
in fixed 64 s *slabs* with exact carried state, so device memory is O(slab)
while keeping the chunk-parallel formulation inside each slab:

* slab length is a multiple of lcm(24000, 1024) = 768000 samples (16 s), so
  the 1024-pt window accumulator is empty at every boundary — no window
  straddles a slab edge and window indices simply continue;
* the denoiser boundary state (raw input tail, 4 feature-context frames,
  OLA tail, upsampler sample) is carried through
  ``offline.denoise_offline_carry`` — bit-identical chaining;
* the FSM carry continues across slabs (``fsm.scan_windows``).

Results are identical to the one-shot path (asserted by tests).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VADConfig
from ..models import nsnet2
from ..pipeline import fsm, offline, vad
from . import mesh as mesh_lib
from .runner import StreamResult

SLAB_ALIGN_CHUNKS = 32  # 16 s: lcm(chunk=24000, fft=1024) / 24000


class SlabRunner:
    """Constant-memory batched VAD over arbitrarily long streams."""

    def __init__(
        self,
        params: nsnet2.NSNet2Params,
        vad_config: VADConfig | None = None,
        n_channels: int = 2,
        sample_rate: int = 48000,
        slab_chunks: int = 128,  # 64 s
        mesh=None,
        use_mesh: bool = True,
        use_pallas_fsm: bool | None = None,
        use_host_fsm: bool | None = None,
        # decode threads (default min(8, B, cpu_count)) and pipeline depth:
        # peak host RAM is ~(depth + 2) slabs, so depth=1 bounds it at ~3.
        prefetch_workers: int | None = None,
        prefetch_depth: int = 1,
        # Cross-slab overlapped front-end: "flat" computes slab s+1's
        # segment product as an independent flat op in slab s's program
        # (offline.window_inputs_flat — materialize scoring path, XLA
        # schedules the overlap itself; bitwise-trivial); "on" forces it
        # through slab s's GRU scan as a rider
        # (offline.window_inputs_pipelined — composite path; measured a
        # LOSS on chip, ROOFLINE dead-end section); "deep" additionally
        # defers each slab's FF head (host-FSM loop only, emissions lag
        # one call; also a measured loss). Identical outputs
        # (tests/test_pipelined.py, tests/test_flat_overlap.py). Default
        # from FVAD_SLAB_PIPELINE (off until an on-chip A/B flips it).
        pipeline_fe: bool | str | None = None,
    ):
        if slab_chunks % SLAB_ALIGN_CHUNKS != 0:
            raise ValueError(f"slab_chunks must be a multiple of {SLAB_ALIGN_CHUNKS}")
        if pipeline_fe is None:
            pipeline_fe = os.environ.get("FVAD_SLAB_PIPELINE", "off")
        if pipeline_fe in (True, "on"):
            mode = "on"
        elif pipeline_fe in ("deep", "flat"):
            mode = pipeline_fe
        else:
            mode = "off"
        if mode in ("on", "deep") and not offline.band_composite_enabled():
            mode = "off"  # rider paths are composite-only
        if mode == "flat" and offline.band_composite_enabled():
            mode = "off"  # flat overlaps the materialize scoring path
        self.pipeline_fe = mode
        if mode != "off":
            # The one-slab lookahead consumes one unit of decode-ahead margin
            # (slab s's dispatch waits for slab s+1's decode); keep the same
            # effective overlap at the cost of ~one more slab of host RAM.
            prefetch_depth = max(prefetch_depth, 2)
        if use_host_fsm is None:
            # Default: host-FSM decode (native/fvadfsm.cpp) in single-process
            # runs — the device step drops its only serial stage and the
            # decode (with its async-copied window-input fetch) overlaps the
            # next slab's device work (ROOFLINE.md).
            from ..pipeline import fsm_host

            use_host_fsm = fsm_host.available() and jax.process_count() == 1
        self.use_host_fsm = use_host_fsm
        if self.pipeline_fe == "deep" and not use_host_fsm:
            # Deep mode's one-call emission lag is implemented for the
            # host-FSM loop; device-FSM runs get stage 1.
            self.pipeline_fe = "on"
        if self.pipeline_fe == "deep" and not isinstance(params, nsnet2.NSNet2Params):
            # window_inputs_deep defers nsnet2.apply's FF head specifically;
            # duck-typed gain models (models/registry.py) get stage 1, whose
            # rider path stays model-agnostic through registry.apply_model.
            self.pipeline_fe = "on"
        if use_pallas_fsm is None:
            use_pallas_fsm = jax.devices()[0].platform != "cpu"
        self.use_pallas_fsm = use_pallas_fsm
        vad_config = vad_config or VADConfig()
        self.params = params
        self.st = vad.statics_from_config(vad_config, sample_rate, n_channels)
        self.alt_configs = tuple(vad_config.alt_vad_machine_configs or ())
        self.alt_params = (
            vad.stack_machine_params(self.st, self.alt_configs)
            if self.alt_configs
            else None
        )
        self.n_alt = len(self.alt_configs)
        self.slab_chunks = slab_chunks
        self.slab_samples = slab_chunks * self.st.chunk_size
        self.mesh = mesh if mesh is not None else (mesh_lib.data_mesh() if use_mesh else None)
        self.prefetch_workers = prefetch_workers
        self.prefetch_depth = prefetch_depth
        self._fn = None
        self._prod_fn = None
        self._deep_init = None

    # ------------------------------------------------------------------

    def _build(self):
        st = self.st
        params = self.params
        chunk = st.chunk_size
        k = self.slab_chunks
        n_windows = (k * chunk) // st.fft_size

        def one_stream(audio, den_carry, n_valid_chunks):
            den_carry, min_vol, ratios, valid, _ = offline.window_inputs_carry(
                params, st, audio, den_carry, n_valid_chunks
            )
            return den_carry, min_vol, ratios, valid

        use_pallas = self.use_pallas_fsm
        n_alt = self.n_alt
        alt_params = self.alt_params

        def run_fsm(params_rows, carry, mv, rt, va, win_base):
            """Row-parallel FSM over [N, W] inputs with per-row params."""
            if use_pallas:
                from ..pipeline import fsm_pallas

                out, carry = fsm_pallas.scan_windows_pallas(
                    st.fsm_shape, params_rows, mv, rt, va,
                    carry=carry, win_base=win_base, return_carry=True,
                )
                return carry, out
            wi = win_base[:, None] + jnp.arange(n_windows, dtype=jnp.int32)[None, :]
            return fsm.scan_windows_rows(st.fsm_shape, params_rows, carry, mv, rt, wi, va)

        def dequant(audio):
            if audio.dtype == jnp.int16:
                # Raw PCM16 shipped at half the H2D bytes; the dequant is
                # exact in f32 (16-bit int and power-of-two divide), so this
                # is bit-identical to host-side decode (io_/wav.py PCM16).
                return audio.astype(jnp.float32) / np.float32(32768.0)
            return audio

        def frontend_fn(audio, den_carry, chunk_valids):
            """Host-FSM mode: device computes only the chunk-parallel
            front-end; the FSM decodes on the host from these outputs."""
            audio = dequant(audio)
            n_valid = jnp.sum(chunk_valids.astype(jnp.int32), axis=1)
            return jax.vmap(one_stream)(audio, den_carry, n_valid)

        # "on" rides slab s+1's product through this slab's GRU scan;
        # "flat" computes it as an independent op in the same program
        # (XLA schedules the overlap — same call protocol either way).
        pipe_batch = (
            offline.window_inputs_batch_flat
            if self.pipeline_fe == "flat"
            else offline.window_inputs_batch_pipelined
        )

        def frontend_pipe_fn(audio, prod, den_carry, chunk_valids, audio_next):
            """Overlapped host-FSM device step: window inputs for slab s from
            its precomputed segment product; slab s+1's product computed in
            the same program (flat op or scan rider per pipeline_fe)."""
            audio, audio_next = dequant(audio), dequant(audio_next)
            n_valid = jnp.sum(chunk_valids.astype(jnp.int32), axis=1)
            den_carry, mv, rt, va, prod_next = pipe_batch(
                params, st, audio, prod, den_carry, audio_next, n_valid
            )
            return den_carry, prod_next, mv, rt, va

        def frontend_deep_fn(audio, prod, deep, den_carry, chunk_valids, audio_next):
            """Deep-pipelined host-FSM device step: EMITS slab s-1's window
            inputs (its FF head rode this slab's scan — see
            offline.window_inputs_deep's priming/flush protocol)."""
            audio, audio_next = dequant(audio), dequant(audio_next)
            n_valid = jnp.sum(chunk_valids.astype(jnp.int32), axis=1)
            den_carry, deep, (mv, rt, va), prod_next = (
                offline.window_inputs_batch_deep(
                    params, st, audio, prod, deep, den_carry, audio_next, n_valid
                )
            )
            return den_carry, deep, prod_next, mv, rt, va

        sh = mesh_lib.batch_sharding(self.mesh) if self.mesh is not None else None
        if self.pipeline_fe != "off":
            # Prologue: slab 0's segment product (every later slab's product
            # comes out of the previous step's rider). The rider/deep modes
            # reproduce the FUSED basis program row-sliced, so their slab-0
            # product must pin predecim off to keep the whole chain one
            # program (PARITY.md deviation 13); flat uses the shipping
            # default (its prod op is the same segmat_prod everywhere).
            rider_predecim = False if self.pipeline_fe in ("on", "deep") else None

            def prod_fn(audio, raw_tail):
                return offline.segmat_prod(
                    dequant(audio), raw_tail, st.downsample_rate,
                    predecim=rider_predecim,
                )

            self._prod_fn = (
                jax.jit(prod_fn, in_shardings=(sh, sh)) if sh is not None
                else jax.jit(prod_fn)
            )
        if self.pipeline_fe == "deep":
            def deep_init(b):
                return jax.vmap(
                    lambda _: offline.init_deep_state(
                        st.n_channels, self.slab_chunks, st.fft_size,
                        st.downsample_rate,
                    )
                )(jnp.arange(b))

            self._deep_init = deep_init

        if self.use_host_fsm:
            fn = {
                "off": frontend_fn,
                "on": frontend_pipe_fn,
                "flat": frontend_pipe_fn,
                "deep": frontend_deep_fn,
            }[self.pipeline_fe]
            n_args = {"off": 3, "on": 5, "flat": 5, "deep": 6}[self.pipeline_fe]
            if sh is not None:
                return jax.jit(fn, in_shardings=(sh,) * n_args)
            return jax.jit(fn)

        def slab_fn(audio, den_carry, fsm_carry, alt_carry, win_base, chunk_valids):
            audio = dequant(audio)
            n_valid = jnp.sum(chunk_valids.astype(jnp.int32), axis=1)
            den_carry, mv, rt, va = jax.vmap(one_stream)(audio, den_carry, n_valid)
            out = _fsm_part(audio.shape[0], fsm_carry, alt_carry, win_base, mv, rt, va)
            return (den_carry,) + out

        def slab_pipe_fn(
            audio, prod, den_carry, fsm_carry, alt_carry, win_base, chunk_valids,
            audio_next,
        ):
            audio, audio_next = dequant(audio), dequant(audio_next)
            n_valid = jnp.sum(chunk_valids.astype(jnp.int32), axis=1)
            den_carry, mv, rt, va, prod_next = pipe_batch(
                params, st, audio, prod, den_carry, audio_next, n_valid
            )
            out = _fsm_part(audio.shape[0], fsm_carry, alt_carry, win_base, mv, rt, va)
            return (den_carry, prod_next) + out

        def _fsm_part(b, fsm_carry, alt_carry, win_base, mv, rt, va):
            primary_rows = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (b,) + np.shape(x)), st.fsm_params
            )
            fsm_carry, out = run_fsm(primary_rows, fsm_carry, mv, rt, va, win_base)

            alt_out = None
            if n_alt:
                # Flatten (stream, machine) into rows: row r = (b, k) with
                # b-major ordering (jnp.repeat over streams x tile of configs).
                mv_a = jnp.repeat(mv, n_alt, axis=0)
                rt_a = jnp.repeat(rt, n_alt, axis=0)
                va_a = jnp.repeat(va, n_alt, axis=0)
                wb_a = jnp.repeat(win_base, n_alt, axis=0)
                alt_rows = jax.tree_util.tree_map(
                    lambda x: jnp.tile(x, (b,) + (1,) * (np.ndim(x) - 1)), alt_params
                )
                alt_carry, alt_out = run_fsm(alt_rows, alt_carry, mv_a, rt_a, va_a, wb_a)
            return fsm_carry, alt_carry, out, alt_out, va

        fn = slab_pipe_fn if self.pipeline_fe != "off" else slab_fn
        n_args = 8 if self.pipeline_fe != "off" else 6
        if sh is not None:
            return jax.jit(fn, in_shardings=(sh,) * n_args)
        return jax.jit(fn)

    def _init_den_carry(self, b):
        return jax.vmap(
            lambda _: offline.init_slab_carry(self.st.n_channels, self.st.downsample_rate)
        )(jnp.arange(b))

    def _init_carries(self, b):
        den = self._init_den_carry(b)
        fsm_c = jax.vmap(
            lambda _: fsm.init_carry(self.st.fsm_shape, self.st.fsm_params)
        )(jnp.arange(b))
        alt_c = None
        if self.n_alt:
            alt_rows = jax.tree_util.tree_map(
                lambda x: jnp.tile(x, (b,) + (1,) * (np.ndim(x) - 1)), self.alt_params
            )
            alt_c = jax.vmap(lambda p: fsm.init_carry(self.st.fsm_shape, p))(alt_rows)
        return den, fsm_c, alt_c

    def _host_fsm_loop(
        self, prefetcher, n_slabs, b_pad, den_carry, windows_per_slab,
        slab_outs, alt_outs,
    ):
        """Device front-end loop with software-pipelined host FSM decode:
        slab s's window inputs are fetched and decoded while the device
        crunches slab s+1.  The host carry (Kahan state included) chains
        slabs exactly continuously — unlike the device kernel's per-call
        reseed, chained and one-shot host runs are bitwise identical."""
        from ..pipeline import fsm_host

        st = self.st
        host_c = fsm_host.init_host_carry(st.fsm_shape, st.fsm_params, b_pad)
        alt_rows = alt_host_c = None
        n_alt = self.n_alt
        if n_alt:
            alt_rows = fsm_host.tile_param_rows(self.alt_params, b_pad)
            alt_host_c = fsm_host.init_host_carry(
                st.fsm_shape, alt_rows, b_pad * n_alt
            )

        def decode(s, handles):
            mv, rt, va = (np.asarray(x) for x in handles)
            wb = np.full((b_pad,), s * windows_per_slab, np.int32)
            out = fsm_host.scan_windows_host(
                st.fsm_shape, st.fsm_params, mv, rt, va, carry=host_c, win_base=wb
            )
            slab_outs.append(out)
            if n_alt:
                alt_outs.append(
                    fsm_host.scan_windows_host(
                        st.fsm_shape, alt_rows,
                        np.repeat(mv, n_alt, axis=0),
                        np.repeat(rt, n_alt, axis=0),
                        np.repeat(va, n_alt, axis=0),
                        carry=alt_host_c,
                        win_base=np.repeat(wb, n_alt),
                    )
                )

        pending = None

        def dispatched(s, mv, rt, va):
            # Start the D2H copies at dispatch time so the fetch overlaps
            # device compute (serial post-hoc fetches through a slow link
            # would otherwise serialize — measured, ROOFLINE.md); decode the
            # PREVIOUS slab while the device crunches this one.
            nonlocal pending
            for x in (mv, rt, va):
                try:
                    x.copy_to_host_async()
                except AttributeError:
                    pass
            if pending is not None:
                decode(*pending)
            pending = (s, (mv, rt, va))

        if self.pipeline_fe == "deep":
            # Deep protocol: call s EMITS slab s-1 (drop the priming
            # emission, flush with a zero slab to drain slab n-1).
            prod = None
            dp = self._deep_init(b_pad)
            zero_slab = zero_cv = None
            for s, (slab, cv, slab_next) in enumerate(
                self._lookahead(prefetcher, n_slabs)
            ):
                if prod is None:
                    prod = self._prod_fn(slab, den_carry["raw_tail"])
                    zero_slab, zero_cv = jnp.zeros_like(slab), jnp.zeros_like(cv)
                den_carry, dp, prod, mv, rt, va = self._fn(
                    slab, prod, dp, den_carry, cv, slab_next
                )
                if s >= 1:
                    dispatched(s - 1, mv, rt, va)
            _, _, _, mv, rt, va = self._fn(
                zero_slab, prod, dp, den_carry, zero_cv, zero_slab
            )
            dispatched(n_slabs - 1, mv, rt, va)
        elif self.pipeline_fe in ("on", "flat"):
            prod = None
            for s, (slab, cv, slab_next) in enumerate(
                self._lookahead(prefetcher, n_slabs)
            ):
                if prod is None:  # prologue: slab 0's segment product
                    prod = self._prod_fn(slab, den_carry["raw_tail"])
                den_carry, prod, mv, rt, va = self._fn(
                    slab, prod, den_carry, cv, slab_next
                )
                dispatched(s, mv, rt, va)
        else:
            for s in range(n_slabs):
                slab, cv = prefetcher.get()
                den_carry, mv, rt, va = self._fn(
                    jnp.asarray(slab), den_carry, jnp.asarray(cv)
                )
                dispatched(s, mv, rt, va)
        if pending is not None:
            decode(*pending)

    def _lookahead(self, prefetcher, n_slabs):
        """Yield (slab, cv, slab_next) device arrays with one-slab lookahead
        (slab_next is a zeros slab on the final iteration — the pipelined
        step computes and discards its product)."""
        slab, cv = (jnp.asarray(x) for x in prefetcher.get())
        for s in range(n_slabs):
            if s + 1 < n_slabs:
                nslab, ncv = (jnp.asarray(x) for x in prefetcher.get())
            else:
                nslab, ncv = jnp.zeros_like(slab), None
            yield slab, cv, nslab
            slab, cv = nslab, ncv

    def run(
        self, audio_batch: np.ndarray, lengths: Optional[Sequence[int]] = None
    ) -> list[StreamResult]:
        """Run over [B, C, T] audio (any T); loops 64 s slabs on the host."""
        b, c, t = audio_batch.shape
        if lengths is None:
            lengths = [t] * b

        def reader(i, start, n):
            return audio_batch[i, :, start : start + n]

        return self.run_readers([lambda s, n, i=i: reader(i, s, n) for i in range(b)], lengths)

    def run_readers(
        self, readers, lengths: Sequence[int], raw16: bool = False
    ) -> list[StreamResult]:
        """Run over streams served by reader callables.

        Args:
          readers: list of ``read(start_sample, n_samples) -> [C, m]`` (m may
            be short at EOF; the tail is zero-padded).
          lengths: total per-stream sample counts.
          raw16: readers return planar int16 PCM; slabs ship to the device at
            half the bytes and dequantize there (bit-identical to f32 decode
            on host — see slab_fn).
        Returns:
          one StreamResult per stream.
        """
        b = len(readers)
        if self.use_host_fsm and jax.process_count() > 1:
            raise ValueError(
                "use_host_fsm requires a single process: multi-process "
                "outputs are sharded across hosts (leave use_host_fsm unset "
                "to get the device-FSM path automatically)"
            )
        chunk = self.st.chunk_size
        valid_chunks = np.asarray([l // chunk for l in lengths], np.int64)
        max_chunks = int(valid_chunks.max(initial=0))
        if max_chunks == 0:
            return [StreamResult(segments=[]) for _ in range(b)]
        n_slabs = (max_chunks + self.slab_chunks - 1) // self.slab_chunks

        b_pad = mesh_lib.pad_batch(b, self.mesh) if self.mesh is not None else b
        if self._fn is None:
            self._fn = self._build()
        if self.use_host_fsm:
            den_carry, fsm_carry, alt_carry = self._init_den_carry(b_pad), None, None
        else:
            den_carry, fsm_carry, alt_carry = self._init_carries(b_pad)
        win_base = jnp.zeros((b_pad,), jnp.int32)
        windows_per_slab = self.slab_samples // self.st.fft_size

        # Host/device pipeline: a threaded prefetcher decodes the streams of
        # slab k+1 in parallel (worker pool over the native codecs — the
        # reference's thread-per-recording libsndfile loader re-expressed,
        # simulator.zig:221-232) while the device crunches slab k; device
        # handles are collected and fetched once at the end (dispatch is
        # async). Per-slab outputs are tiny (~100 KB/stream), the audio
        # itself never comes back.
        from ..io_.prefetch import SlabPrefetcher

        prefetcher = SlabPrefetcher(
            readers,
            valid_chunks,
            n_slabs=n_slabs,
            slab_chunks=self.slab_chunks,
            chunk_size=chunk,
            n_channels=self.st.n_channels,
            b_pad=b_pad,
            workers=self.prefetch_workers,
            depth=self.prefetch_depth,
            dtype=np.int16 if raw16 else np.float32,
        )
        slab_outs = []
        alt_outs = []
        try:
            if self.use_host_fsm:
                self._host_fsm_loop(
                    prefetcher, n_slabs, b_pad, den_carry, windows_per_slab,
                    slab_outs, alt_outs,
                )
            elif self.pipeline_fe != "off":
                prod = None
                for slab, cv, slab_next in self._lookahead(prefetcher, n_slabs):
                    if prod is None:
                        prod = self._prod_fn(slab, den_carry["raw_tail"])
                    (den_carry, prod, fsm_carry, alt_carry, out, alt_out, va) = (
                        self._fn(
                            slab, prod, den_carry, fsm_carry, alt_carry,
                            win_base, cv, slab_next,
                        )
                    )
                    win_base = win_base + jnp.int32(windows_per_slab)
                    slab_outs.append(out)
                    if alt_out is not None:
                        alt_outs.append(alt_out)
            else:
                for s in range(n_slabs):
                    slab, cv = prefetcher.get()
                    den_carry, fsm_carry, alt_carry, out, alt_out, va = self._fn(
                        jnp.asarray(slab), den_carry, fsm_carry, alt_carry,
                        win_base, jnp.asarray(cv),
                    )
                    win_base = win_base + jnp.int32(windows_per_slab)
                    slab_outs.append(out)
                    if alt_out is not None:
                        alt_outs.append(alt_out)
        finally:
            prefetcher.close()

        slab_outs = jax.device_get(slab_outs)
        alt_outs = jax.device_get(alt_outs) if alt_outs else None

        def stacked_row(outs, r):
            return jax.tree_util.tree_map(
                lambda *xs: np.concatenate([np.asarray(x)[r] for x in xs], axis=0),
                *outs,
            )

        results = []
        for i in range(b):
            segs = vad.segments_from_outputs(
                self.st,
                vad.ChunkOutput(
                    windows=stacked_row(slab_outs, i), window_valid=None, denoised=None
                ),
            )
            alt_segs = []
            if alt_outs is not None:
                for k in range(self.n_alt):
                    alt_segs.append(
                        vad.segments_from_outputs(
                            self.st,
                            vad.ChunkOutput(
                                windows=stacked_row(alt_outs, i * self.n_alt + k),
                                window_valid=None,
                                denoised=None,
                            ),
                        )
                    )
            results.append(StreamResult(segments=segs, alt_segments=alt_segs))
        return results
