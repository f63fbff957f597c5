"""A/B: device-complete step (Pallas FSM) vs device front-end + host-C FSM.

Measures, interleaved in ONE process (relay rule: never compare across
processes — .claude/skills/verify/SKILL.md):

* full      — offline.process_batch_offline with the Pallas FSM kernel
              (the round-2 default): one device call, events on device.
* frontend  — the same step minus the FSM (window inputs only): the
              device-side floor the host-FSM design targets.
* host_fsm  — frontend + D2H fetch of (min_vol, ratios, valid) + the
              native host decoder, software-pipelined the way bench.py
              runs it: all device calls dispatched first, then per-call
              fetch+decode while the device queue drains.  Per-call cost
              is the max of device step and fetch+decode, so this number
              tells us whether the host path's end-to-end step beats the
              device-complete step.

Also reports the isolated host-decode ms/call (numpy inputs, no device).

Run from the repo root on the real chip:  python benchmarks/host_fsm_ab.py
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
from formula_vad_tpu.pipeline import fsm_host, offline, vad

B = int(os.environ.get("AB_STREAMS", "21"))
K = int(os.environ.get("AB_CHUNKS", "40"))
N_SHORT, N_LONG = 3, 15


def sync(x):
    float(jnp.max(jnp.abs(x.astype(jnp.float32))))


def main():
    params = nsnet2.load(None)
    st = vad.statics_from_config(VADConfig())
    rng = np.random.default_rng(0)
    audios = [
        jnp.asarray(
            0.02 * rng.standard_normal((B, 2, K * st.chunk_size)), jnp.float32
        )
        for _ in range(3)
    ]
    nv = jnp.full((B,), K, jnp.int32)

    def make_full():
        # Compiled Pallas only exists on TPU; the CPU smoke path
        # (FVAD_BENCH_CPU) uses the scan FSM so the script runs end-to-end.
        use_pallas = jax.devices()[0].platform != "cpu"

        def f(a):
            win_out, valid = offline.process_batch_offline(
                params, st, a, use_pallas_fsm=use_pallas
            )
            return win_out.event
        return jax.jit(f)

    def make_fe():
        def f(a):
            return jax.vmap(lambda x, n: offline.window_inputs(params, st, x, n))(
                a, nv
            )
        return jax.jit(f)

    def timed_loop(fn, n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(audios[i % 3])
        sync(out if not isinstance(out, tuple) else out[0])
        return time.perf_counter() - t0

    def slope(fn):
        a = timed_loop(fn, N_SHORT)
        b = timed_loop(fn, N_LONG)
        return (b - a) / (N_LONG - N_SHORT) * 1e3

    def host_fsm_step(fe, n, async_copy=True):
        """Dispatch all device calls (starting async D2H copies as each is
        enqueued, bench.py's structure), then fetch+decode each in order."""
        t0 = time.perf_counter()
        handles = []
        for i in range(n):
            h = fe(audios[i % 3])
            if async_copy:
                for x in h:
                    try:
                        x.copy_to_host_async()
                    except AttributeError:
                        pass
            handles.append(h)
        ev = None
        for mv, rt, va in handles:
            out = fsm_host.scan_windows_host(
                st.fsm_shape, st.fsm_params, np.asarray(mv), np.asarray(rt),
                np.asarray(va),
            )
            ev = out.event
        return time.perf_counter() - t0, ev

    def slope_host(fe, async_copy=True):
        a, _ = host_fsm_step(fe, N_SHORT, async_copy)
        b, _ = host_fsm_step(fe, N_LONG, async_copy)
        return (b - a) / (N_LONG - N_SHORT) * 1e3

    for mode_name, level in (("f32", "highest"), ("bf16", "default")):
        precision.set_matmul_precision(level)
        full = make_full()
        fe = make_fe()
        sync(full(audios[0]))
        print(f"[{mode_name}] full compiled", flush=True)
        out0 = fe(audios[0])
        sync(out0[0])
        print(f"[{mode_name}] frontend compiled", flush=True)
        # decode warm-up + isolated host decode cost
        mv0, rt0, va0 = (np.asarray(x) for x in out0)
        t0 = time.perf_counter()
        for _ in range(10):
            fsm_host.scan_windows_host(st.fsm_shape, st.fsm_params, mv0, rt0, va0)
        t_dec = (time.perf_counter() - t0) / 10 * 1e3
        print(f"[{mode_name}] isolated host decode: {t_dec:.3f} ms/call", flush=True)

        for rep in range(3):
            t_full = slope(full)
            t_fe = slope(fe)
            t_host = slope_host(fe, async_copy=True)
            t_host_sync = slope_host(fe, async_copy=False)
            print(
                f"[{mode_name}] rep{rep} full={t_full:.2f} ms  "
                f"frontend={t_fe:.2f} ms  host_fsm={t_host:.2f} ms  "
                f"host_fsm_noasync={t_host_sync:.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
