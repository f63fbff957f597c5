"""Offline-scoring throughput vs batch width, measured in ONE process.

ROOFLINE.md §"Why not higher MFU?" predicts that the two serial recurrences
(GRU 108 steps, FSM windows) amortize their fixed per-step costs across
more rows, so per-audio-second cost should fall as B grows beyond the
21-stream Miami plan shape. This measures it: the full batched scoring
step (offline.process_batch_offline, Pallas FSM) at B in {21, 42, 84, 168}
x 40 chunks, per-audio-second slope cost, bf16 and (optionally) highest.

All comparisons are within one process (relay throttle lottery makes
cross-process absolutes meaningless - verify SKILL.md); per-call time is
the slope between a short and a long run.

Usage (on the real chip, cwd=/root/repo):
    python benchmarks/batch_scale.py            # bf16, host-FSM step
    BENCH_MODES=both python benchmarks/batch_scale.py
    BENCH_FSM=pallas python benchmarks/batch_scale.py   # device-complete step
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import bench_setup  # noqa: E402

bench_setup()

import jax
import jax.numpy as jnp
import numpy as np

from formula_vad_tpu.config import VADConfig
from formula_vad_tpu.models import nsnet2
from formula_vad_tpu.ops import precision
from formula_vad_tpu.pipeline import offline, vad

K = int(os.environ.get("BENCH_CHUNKS", "40"))
WIDTHS = tuple(
    int(b) for b in os.environ.get("BENCH_WIDTHS", "21,42,84,168").split(",")
)
ITERS = int(os.environ.get("BENCH_ITERS", "12"))


def measure(params, st, b, level):
    precision.set_matmul_precision(level)
    use_pallas = jax.devices()[0].platform != "cpu"
    host_fsm = os.environ.get("BENCH_FSM", "host") == "host"
    if host_fsm:
        from formula_vad_tpu.pipeline import fsm_host

        host_fsm = fsm_host.available()

    def batch_fn(audio):
        win_out, valid = offline.process_batch_offline(
            params, st, audio, use_pallas_fsm=use_pallas
        )
        return win_out.event, win_out.seg_valid

    def fe_fn(audio):
        return offline.window_inputs_batch(params, st, audio)

    fn = jax.jit(fe_fn if host_fsm else batch_fn)
    rng = np.random.default_rng(b)
    audios = [
        jnp.asarray(
            0.02 * rng.standard_normal((b, 2, K * st.chunk_size)), jnp.float32
        )
        for _ in range(2)
    ]
    if host_fsm:
        # Same structure as bench.py's host path: dispatch all with async
        # D2H copies, then fetch+decode (included in the timed loop).
        from formula_vad_tpu.pipeline import fsm_host

        def run(n):
            t0 = time.perf_counter()
            handles = []
            for i in range(n):
                h = fn(audios[i % 2])
                for x in h:
                    try:
                        x.copy_to_host_async()
                    except AttributeError:
                        pass
                handles.append(h)
            for mv, rt, va in handles:
                fsm_host.scan_windows_host(
                    st.fsm_shape, st.fsm_params,
                    np.asarray(mv), np.asarray(rt), np.asarray(va),
                )
            return time.perf_counter() - t0

        run(1)  # compile + decoder warm-up
    else:
        ev, _ = fn(audios[0])
        float(jnp.sum(ev))  # compile + real sync (block_until_ready is a relay no-op)

        def run(n):
            t0 = time.perf_counter()
            ev = None
            for i in range(n):
                ev, _ = fn(audios[i % 2])
            float(jnp.sum(ev))
            return time.perf_counter() - t0

    n_long = max(4, ITERS)
    n_short = max(2, n_long // 4)
    audio_sec = b * K * st.chunk_size / st.sample_rate
    # Relay hiccups can produce nonsense slopes (bench.py's retry rule):
    # accept a slope within [0.3, 3]x of the inclusive per-call average.
    for _ in range(3):
        dt_short = run(n_short)
        dt_long = run(n_long)
        per_call = (dt_long - dt_short) / (n_long - n_short)
        avg = dt_long / n_long
        if 0.3 * avg <= per_call <= 3.0 * avg:
            break
    else:
        per_call = avg
    return per_call, audio_sec / per_call


def main():
    params = nsnet2.load(None)
    st = vad.statics_from_config(VADConfig())
    levels = ["default"]
    if os.environ.get("BENCH_MODES") == "both":
        levels = ["highest", "default"]
    for level in levels:
        print(f"== precision={level} ==")
        base = None
        for b in WIDTHS:
            per_call, rtf = measure(params, st, b, level)
            us_per_audio_sec = per_call / (b * K * st.chunk_size / st.sample_rate) * 1e6
            base = base or us_per_audio_sec
            print(
                f"B={b:4d}  {per_call*1e3:8.2f} ms/call  "
                f"{us_per_audio_sec:7.2f} us/audio-sec  "
                f"rtf={rtf:9.0f}x  vs B={WIDTHS[0]}: {base/us_per_audio_sec:.2f}x"
            )


if __name__ == "__main__":
    main()
