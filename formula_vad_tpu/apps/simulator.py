"""Batch evaluation harness — the ``simulator`` executable
(src/simulator.zig:89-143).

Reads a plan JSON (``{"instances": [{name, audio_path, ref_path}],
"config": {...}}``), runs the VAD over every recording, scores against the
Audacity reference labels, writes per-instance Audacity txts + report.txt
into a timestamped output directory, and prints the report.

Where the reference spawns one OS thread per recording
(simulator.zig:221-232), this app batches all streams into one device batch
and runs them in a single sharded program (``parallel.runner.BatchRunner``).
Set ``"batch_streams": false`` in the plan config to instead run streams
sequentially through the host streaming pipeline. Both paths save per-
segment audio clips as Ogg Vorbis VBR like the reference (``io_/ogg.py``;
``recording_format: "wav"`` switches to float32 WAV).

Usage: python -m formula_vad_tpu.apps.simulator -i plan.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

from ..config import SIMULATOR_STAT_CONFIG, SimConfig, StatConfig, sim_config_from_dict
from ..eval import SpeechSegment, formats, init_and_run, report
from ..io_ import AudioSource
from ..io_ import native as io_native
from ..io_ import ogg
from ..io_.wav import write_wav
from ..utils.logging import scoped
from ..models.registry import load_denoiser
from ..parallel.runner import BatchRunner
from ..pipeline.pipeline import AudioPipeline, Callbacks
from ..config import PipelineConfig

F32 = np.float32


@dataclasses.dataclass
class Instance:
    name: str
    audio_path: str
    ref_path: str
    out_dir: str | None = None
    reference_segments: list | None = None
    vad_segments: list | None = None  # raw dicts from the pipeline
    alt_vad_segments: list | None = None  # per alt machine config
    evaluator: object | None = None


def load_plan(plan_path: str):
    base = os.path.dirname(os.path.abspath(plan_path)) or "."
    with open(plan_path) as f:
        plan_text = f.read()
    plan = json.loads(plan_text)
    config = sim_config_from_dict(plan.get("config", {}))
    instances = [
        Instance(
            name=inst["name"],
            audio_path=os.path.join(base, inst["audio_path"]),
            ref_path=os.path.join(base, inst["ref_path"]),
        )
        for inst in plan["instances"]
    ]
    return instances, config, base, plan_text


def vad_segments_to_eval(segments: list[dict], sample_rate: int) -> list[SpeechSegment]:
    """Convert pipeline segments to evaluation segments with the reference's
    f32 seconds conversion and debug annotation (SimulationInstance.zig:227-255)."""
    out = []
    for s in segments:
        out.append(
            SpeechSegment(
                from_sec=float(F32(s["sample_from"]) / F32(sample_rate)),
                to_sec=float(F32(s["sample_to"]) / F32(sample_rate)),
                side="vad",
                debug_info=f"vr:{s['avg_channel_vol_ratio']:.2f} vad:{s['vad_met_sec']:.1f}s",
            )
        )
    return out


def _clip_writer(config: SimConfig):
    """Resolve recording_format -> (extension, write(path, planar, rate)).

    "ogg" matches the reference's VBR-quality-1.0 clips
    (SimulationInstance.zig:62); falls back to float32 WAV with a warning
    when the system Vorbis codec is unavailable."""
    fmt = config.recording_format
    if fmt == "ogg" and not ogg.available():
        scoped("simulator").warning(
            "recording_format=ogg but the Vorbis codec is unavailable; saving WAV"
        )
        fmt = "wav"
    if fmt == "ogg":
        return ".ogg", lambda path, data, rate: ogg.write_ogg(path, data, rate, 1.0)
    return ".wav", lambda path, data, rate: write_wav(path, data, rate)


def _save_clips(
    params,
    inst: Instance,
    read_span,  # (start_sample, end_sample) -> [C, n] float32
    total_len: int,
    n_chunks: int,
    chunk: int,
    config: SimConfig,
) -> None:
    """Save per-segment original + denoised clips (the reference's OGG
    recordings, SimulationInstance.zig:37-68).

    The denoised clip is recomputed exactly via the bounded-horizon
    re-denoise (offline.denoise_span) — no need to retain the full
    denoised stream from the scoring pass."""
    import jax.numpy as jnp

    from ..pipeline import offline

    # The reference's deferred stop fires once enough samples are *written*:
    # the original ring receives every pushed sample (including the <0.5 s
    # unprocessed tail), the denoised ring only whole processed chunks — so
    # an original clip exists iff sample_to <= stream length, a denoised one
    # iff sample_to <= processed length (MRBRecorder.zig:88-112).
    processed_end = n_chunks * chunk
    ext, write = _clip_writer(config)
    for seg in inst.vad_segments or []:
        a, b = seg["sample_from"], seg["sample_to"]
        clips = []
        if b <= total_len:
            clips.append(("original", read_span(a, b)))
        if b <= processed_end:
            ka, kb = a // chunk, (b + chunk - 1) // chunk
            # Bounded-horizon exact re-denoise over a windowed read: chunk
            # k0 = ka - WARMUP_CHUNKS is where denoise_span's own warm-up
            # would start, so reading [k0*chunk, kb*chunk) and re-denoising
            # with start offset ka-k0 is bit-identical to passing the whole
            # stream prefix (offline.denoise_span semantics).
            k0 = max(0, ka - offline.WARMUP_CHUNKS)
            span = read_span(k0 * chunk, kb * chunk)
            den = np.asarray(
                offline.denoise_span(params, jnp.asarray(span), ka - k0, kb - k0)
            )
            clips.append(("denoised", den[:, a - ka * chunk : b - ka * chunk]))
        for kind, data in clips:
            # Quietest channel (Recorder.zig:113-128) — same double-precision
            # RMS as the streaming recorder (pipeline.StreamRecorder._finalize)
            # so near-tied channels pick identically on both paths.
            data = np.ascontiguousarray(data, np.float32)
            rms = io_native.rms_per_channel(data)
            if rms is None:
                rms = np.sqrt(np.mean(data.astype(np.float64) ** 2, axis=1))
            best = int(np.argmin(rms))
            write(os.path.join(inst.out_dir, f"{a}-{kind}{ext}"), data[best : best + 1], 48000)


SLAB_AUTO_BYTES = 2 << 30  # switch to the constant-memory slab runner above ~2 GB


def run_batched(instances: list[Instance], config: SimConfig) -> None:
    params = load_denoiser(config.vad_config.denoiser_model_path)
    srcs = []
    lengths = []
    try:
        for inst in instances:
            src = AudioSource.open_stream(inst.audio_path)
            srcs.append(src)
            if src.sample_rate != 48000:
                raise ValueError(f"{inst.name}: sample rate {src.sample_rate} != 48000")
            if src.n_channels != 2:
                # Without this a mono [1, T] source would broadcast into both
                # rows of the batch/slab (forcing the FSM's channel-volume
                # ratio to 1.0 — silently different segments); the daemon
                # path rejects the same mismatch (main.zig:242-257).
                raise ValueError(
                    f"{inst.name}: {src.n_channels} channels != pipeline's 2"
                )
            lengths.append(src.n_frames)
        _run_batched_srcs(instances, config, params, srcs, lengths)
    finally:
        for src in srcs:
            src.close()


def _run_batched_srcs(instances, config, params, srcs, lengths) -> None:
    from ..parallel.slab_runner import SlabRunner

    max_t = max(lengths)
    n_ch = srcs[0].n_channels

    use_slabs = config.use_slabs
    if use_slabs is None:
        use_slabs = len(srcs) * n_ch * max_t * 4 > SLAB_AUTO_BYTES

    if use_slabs:
        # Constant-memory: streams stay on disk; the prefetcher's worker pool
        # decodes slab-by-slab (threaded, decode-ahead). PCM16 WAV sources
        # ship raw int16 at half the H2D bytes (device dequant, bit-exact).
        runner = SlabRunner(params, config.vad_config, slab_chunks=config.slab_chunks)
        raw16 = all(src.supports_raw16 for src in srcs)

        def mk_reader(src):
            def read(start, n):
                src.seek_to_sample(start)
                return src.read_raw16(n) if raw16 else src.read(n)

            return read

        results = runner.run_readers([mk_reader(s) for s in srcs], lengths, raw16=raw16)
    else:
        batch_runner = BatchRunner(params, config.vad_config)
        chunk = batch_runner.st.chunk_size
        pad_t = ((max_t + chunk - 1) // chunk) * chunk
        batch = np.zeros((len(srcs), n_ch, pad_t), np.float32)
        for i, src in enumerate(srcs):
            a = src.read(lengths[i])
            batch[i, :, : a.shape[1]] = a
        results = batch_runner.run(batch, lengths)
        runner = batch_runner

    chunk = runner.st.chunk_size
    for inst, res, src, length in zip(instances, results, srcs, lengths):
        inst.vad_segments = res.segments
        inst.alt_vad_segments = getattr(res, "alt_segments", [])
        if inst.out_dir:

            def read_span(a, b, src=src):
                src.seek_to_sample(a)
                return src.read(b - a)

            _save_clips(params, inst, read_span, length, length // chunk, chunk, config)


def run_streaming(instances: list[Instance], config: SimConfig) -> None:
    """Sequential per-stream run through the host pipeline; saves clips."""
    params = load_denoiser(config.vad_config.denoiser_model_path)
    for inst in instances:
        callbacks = Callbacks()
        if inst.out_dir:
            ext, write = _clip_writer(config)

            def on_rec(buf, kind):
                path = os.path.join(
                    inst.out_dir, f"{buf.global_start_frame_number}-{kind}{ext}"
                )
                write(path, buf.channel_pcm, buf.sample_rate)

            callbacks = Callbacks(
                on_original_recording=lambda b: on_rec(b, "original"),
                on_denoised_recording=lambda b: on_rec(b, "denoised"),
            )
        src = (
            AudioSource.preload(inst.audio_path)
            if config.preload_audio
            else AudioSource.open_stream(inst.audio_path)
        )
        pipe = AudioPipeline(
            PipelineConfig(
                sample_rate=src.sample_rate,
                n_channels=src.n_channels,
                vad_config=config.vad_config,
            ),
            params=params,
            callbacks=callbacks,
        )
        if config.preload_audio:
            pipe.push_samples(src.read_all())
        else:
            while True:
                frames = src.read(config.audio_read_frame_count)
                if frames.shape[1] == 0:
                    break
                pipe.push_samples(frames)
        src.close()
        inst.vad_segments = pipe.segments


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Run the VAD simulation plan.")
    ap.add_argument("-i", "--input", required=True, help="Simulation plan (path to JSON)")
    ap.add_argument(
        "--precision", choices=("highest", "high", "default"), default=None,
        help="Matmul precision: 'highest' = full-f32 parity (default); "
        "'high'/'default' are ~1.4x/2x faster and measured boundary-identical "
        "on the synthetic corpus sweep (benchmarks/precision_sweep.py), with "
        "rare one-window shifts possible on marginal audio (PARITY.md #2)",
    )
    ap.add_argument(
        "--io-dtype", choices=("f32", "bf16"), default=None,
        help="Activation storage dtype: 'bf16' halves activation HBM "
             "bytes (deepest throughput tier; PARITY.md #2)",
    )
    args = ap.parse_args(argv)
    if args.precision:
        from ..ops.precision import set_matmul_precision

        set_matmul_precision(args.precision)
    if args.io_dtype:
        from ..ops.precision import set_io_dtype

        set_io_dtype(args.io_dtype)

    instances, config, base, plan_text = load_plan(args.input)

    # Timestamped output dir + verbatim plan copy (simulator.zig:156-176).
    resolved_out = None
    if config.output_dir:
        stamp = int(time.time())
        # exist_ok=False + suffix retry: two runs launched within the same
        # second must not share a directory (the second would silently
        # overwrite the first's plan.json/clips/report.txt).
        for suffix in range(1000):
            resolved_out = os.path.join(
                base,
                config.output_dir,
                str(stamp) if suffix == 0 else f"{stamp}-{suffix}",
            )
            try:
                os.makedirs(resolved_out, exist_ok=False)
                break
            except FileExistsError:
                continue
        else:
            raise RuntimeError(f"could not allocate an output dir under {stamp}")
        with open(os.path.join(resolved_out, "plan.json"), "w") as f:
            f.write(plan_text)
        for inst in instances:
            inst.out_dir = os.path.join(resolved_out, inst.name)
            os.makedirs(inst.out_dir, exist_ok=True)

    for inst in instances:
        with open(inst.ref_path) as f:
            inst.reference_segments = formats.parse_audacity_segments(f.read(), side="ref")

    if config.batch_streams:
        run_batched(instances, config)
    else:
        run_streaming(instances, config)

    evaluators = []
    for inst in instances:
        vad_segs = vad_segments_to_eval(inst.vad_segments or [], 48000)
        inst.evaluator = init_and_run(vad_segs, inst.reference_segments)
        evaluators.append(inst.evaluator)
        if resolved_out:
            txt = formats.serialize_evaluator_to_audacity_txt(inst.evaluator)
            with open(os.path.join(resolved_out, f"{inst.name}-audacity.txt"), "w") as f:
                f.write(txt)

    stat_config = StatConfig(
        ignore_shorter_than_sec=config.vad_config.vad_machine_config.min_vad_duration_sec,
        extrude_start=SIMULATOR_STAT_CONFIG.extrude_start,
        extrude_end=SIMULATOR_STAT_CONFIG.extrude_end,
        fill_gaps=SIMULATOR_STAT_CONFIG.fill_gaps,
    )
    txt = report.simulation_report([i.name for i in instances], evaluators, stat_config)
    sys.stdout.write(txt)
    if resolved_out:
        with open(os.path.join(resolved_out, "report.txt"), "w") as f:
            f.write(txt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
