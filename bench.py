"""Benchmark: real-time factor + roofline accounting of the batched VAD.

Runs the full per-chunk compute (NSNet2 denoise on both channels, fused
16 kHz band volumes, FSM Pallas scan) for a batch of 21 streams — the 2023
Miami Race plan shape (BASELINE.md) — on the real TPU chip, and reports ONE
JSON line:

    {"metric": "realtime_factor", "value": <audio-sec/sec>, "unit": ...,
     "vs_baseline": value / 5000,
     "tflops_achieved": <algorithmic TFLOP/s>, "mfu": <vs v5e bf16 peak>,
     "modes": {"highest": {...}, "bf16": {...}}}

* value / vs_baseline: the FULL-F32-PARITY (precision=highest) number — the
  honest headline for segment-identical decision parity (PARITY.md #2).
* tflops_achieved: ALGORITHMIC matmul FLOPs (counted once, precision-
  independent — see flops_per_audio_sec) x realtime factor. At
  precision=highest every MXU pass runs ~6x bf16 passes, so the same
  algorithmic FLOP/s costs ~6x the silicon — ROOFLINE.md derives the
  per-mode efficiency from this number.
* mfu: tflops_achieved / 197 (v5e bf16 peak).
* modes.bf16: the same measurement at precision=default (single-pass bf16
  matmuls) — the throughput configuration.

Measurement notes (axon relay — see .claude/skills/verify/SKILL.md):
* jax.block_until_ready does NOT wait through the relay: every timed run
  ends with a device-side reduction fetched to host (a real sync).
* Per-call time is the SLOPE between a short and a long run (fixed sync /
  queue-priming overheads cancel).
* Children get fresh connections (some processes draw a connection
  throttled up to ~19x for life); two runs agreeing within 30% are
  accepted, the max is the best unthrottled estimate.
* Inputs rotate over distinct buffers so no caching layer short-circuits.
* The precision tiers are measured as k>=3 INTERLEAVED round-robin reps
  (compile every tier first, then rep r measures every tier once) and the
  published realtime_factor is the per-tier MEDIAN with min/max spread —
  a blocked once-per-tier loop cannot tell a real tier regression from a
  throttled window (round-3 postmortem: driver bf16_io 22,977x vs local
  44,315x, VERDICT r3 weak #1).
* A fixed-work SENTINEL probe (bf16 matmul chain, same slope machinery)
  samples around EVERY rep round (sentinel.samples_ms, one per round
  boundary). Rep rounds adjacent to a sample >BENCH_SENTINEL_TOL (1.10)
  above the capture's best are EXCLUDED from the published tier median
  (raw median kept alongside as rtf_median_raw; reps_kept per tier), and
  reps escalate adaptively up to BENCH_REPS_MAX (7) while the kept-round
  tier spread exceeds BENCH_SPREAD_TOL (15%) or <2 rounds survive —
  round 4's block-level start/end bracket missed a mid-capture throttle
  whose per-rep spread was 2.2x (BENCH_r04; VERDICT r4 next-#1).
  reps_kept: 0 marks a window too unstable to rank tiers at all.
"""

import json
import os
import re
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

V5E_BF16_PEAK_TFLOPS = 197.0

# When the axon relay (the TPU tunnel) is down, ANY jax backend init hangs
# forever — even jax.devices() (verify skill, round-2 outage: BENCH_r02 was
# an rc-124 timeout kill with no diagnostic). Probe the relay's TCP port
# BEFORE touching jax so an outage produces a structured error line in
# seconds instead of eating the driver's capture window.
RELAY_ADDR = os.environ.get("FVAD_RELAY_PROBE", "127.0.0.1:8083")
CHILD_TIMEOUT = float(os.environ.get("BENCH_CHILD_TIMEOUT", "1500"))


def _relay_reachable(timeout: float = 5.0) -> bool:
    # A bare TCP connect is not enough: one observed outage mode
    # (2026-08-20, right after a device OOM) keeps accepting connections
    # while the HTTP layer is wedged — require an actual response so that
    # mode fails the probe instead of burning a child timeout.
    host, port = RELAY_ADDR.rsplit(":", 1)
    try:
        s = socket.create_connection((host, int(port)), timeout=timeout)
    except OSError:
        return False
    try:
        s.settimeout(timeout)
        s.sendall(b"GET / HTTP/1.0\r\nHost: relay-probe\r\n\r\n")
        return bool(s.recv(1))
    except OSError:
        return False
    finally:
        s.close()


def _fail(reason: str, detail: str = "") -> None:
    """Emit the structured-error JSON line the driver can record, exit 2."""
    out = {"metric": "realtime_factor", "value": None, "error": reason}
    if detail:
        out["detail"] = detail[:500]
    print(json.dumps(out))
    raise SystemExit(2)


def _preflight() -> None:
    """Bounded relay probe: proceed, or exit <60 s with a diagnostic.

    1. TCP-probe the relay port, retrying up to BENCH_RELAY_WAIT_SEC
       (default 25 s) — transient blips recover, real outages fail fast.
    2. If the port never opens, try ONE jax backend init in a child with a
       hard 20 s timeout (covers environments whose TPU is not behind the
       relay port). Only if that also fails is the outage declared.
    Skip everything with FVAD_BENCH_SKIP_PROBE=1.
    """
    if os.environ.get("FVAD_BENCH_SKIP_PROBE") or not RELAY_ADDR:
        return
    deadline = time.monotonic() + float(os.environ.get("BENCH_RELAY_WAIT_SEC", "25"))
    while True:
        if _relay_reachable():
            return
        if time.monotonic() >= deadline:
            break
        time.sleep(3)
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=20, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if probe.returncode == 0:
            return  # backend is alive by some other path; measure normally
        detail = probe.stderr.strip()[-300:]
    except subprocess.TimeoutExpired:
        detail = "jax.devices() hung >20s (relay-down signature)"
    _fail("relay_down",
          f"relay {RELAY_ADDR} unresponsive (refused or HTTP-hung); "
          f"backend probe: {detail}")


def flops_per_audio_sec(st) -> float:
    """Algorithmic matmul FLOPs per second of one stereo 48 kHz stream.

    Counts every MXU matmul in the scoring path (multiply+add = 2 FLOPs),
    with the shapes the compiled program actually runs; elementwise/VPU and
    FSM work is excluded (it is not MXU-countable and ROOFLINE.md treats it
    separately). Precision-independent: a 6-pass f32 matmul still computes
    the same algorithmic FLOPs."""
    n_ch = st.n_channels
    chunks_per_sec = st.sample_rate / st.chunk_size  # 2.0
    n_fft16, hop16, frames = 320, 160, 50
    bins16 = n_fft16 // 2 + 1  # 161
    hidden, ff1, ff2 = 400, 600, 600
    n_band = st.max_bin - st.min_bin + 1

    from formula_vad_tpu.pipeline import offline as _off

    if _off.stft_predecim_enabled():
        # Predecim split (PARITY.md dev. 13): per chunk, `frames`
        # segment-rows through the 0/1 select [480, 160] then the dense
        # basis [160, 4*161] — the compiled program performs ~42% fewer
        # MACs than the fused zero-stuffed basis.
        stft = 2 * frames * ((hop16 * 3) * hop16 + hop16 * (4 * bins16))
    else:
        # Fused basis: `frames` segment-rows through [480, 4*161].
        stft = 2 * frames * (hop16 * 3) * (4 * bins16)
    # model: fc_in on 54 frames, 2 GRU layers (input + recurrent projections
    # each [*, 400] @ [400, 1200]), FF head on 50 output frames.
    mf = frames + 4
    model = (
        2 * mf * bins16 * hidden
        + 2 * (2 * 2 * mf * hidden * 3 * hidden)
        + 2 * frames * (hidden * ff1 + ff1 * ff2 + ff2 * bins16)
    )
    from formula_vad_tpu.ops import stft as stft_mod
    from formula_vad_tpu.pipeline import denoiser as den_mod
    from formula_vad_tpu.pipeline import offline, vad as vad_mod

    if offline.band_composite_enabled():
        # Fully-folded spectra->band conv (PARITY.md deviation 11): one
        # output position per lcm(fft,hop)=5120-sample block (16000/5120
        # blocks per 16 kHz second per channel); kernel FLOPs depend on
        # the dense/split form.
        blk = 5120
        per_block = stft_mod.band_spec_kernel_flops(
            den_mod._WINDOW, vad_mod._hann(st.fft_size), n_fft16,
            st.fft_size, st.min_bin, st.max_bin, 3,
            offline.band_composite_variant(),
        )
        tail = (16000 / blk / chunks_per_sec) * per_block  # per chunk-ch
    else:
        # istft_segmat: [*, 322] @ [322, 320] per frame, plus
        # band_volume_16k: fused upsample+window+band-DFT, [*, 1024] @
        # [1024, 3*2*n_band] per 1024-sample superframe (8000/1024 per
        # chunk per ch).
        tail = 2 * frames * (2 * bins16) * n_fft16 + 2 * (
            8000 / st.fft_size * 3
        ) * st.fft_size * (2 * n_band)
    per_chunk_ch = stft + model + tail
    return per_chunk_ch * n_ch * chunks_per_sec


def main() -> None:
    if os.environ.get("FVAD_BENCH_CHILD"):
        return measure()
    _preflight()
    results = []
    child_errs = []
    for attempt in range(3):
        # The bf16 pass doubles a child's compile time; two children
        # measuring both modes is enough for the modes table (if the first
        # drew a throttled relay connection, its bf16 is rejected by the
        # donor-agreement rule below and the second's is used) — the
        # relay-throttle agreement check only needs the headline from the
        # rest.
        env = {**os.environ, "FVAD_BENCH_CHILD": "1"}
        if attempt > 1:
            env["BENCH_MODES"] = "highest"
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True,
                text=True,
                timeout=CHILD_TIMEOUT,
            )
        except subprocess.TimeoutExpired as te:
            # Salvage first: the child emits the standard table BEFORE the
            # extra rows, so a timeout during an extra row still leaves a
            # complete headline on its partial stdout.
            salvaged = None
            for line in reversed((te.stdout or "").strip().splitlines()):
                try:
                    salvaged = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            if salvaged is not None and salvaged.get("value"):
                print(
                    f"child {attempt} timed out mid-extras; salvaged its "
                    "standard table", file=sys.stderr, flush=True,
                )
                results.append(salvaged)
                if len(results) >= 2:
                    vals = sorted(r["value"] for r in results)
                    if vals[-1] <= 1.3 * vals[-2]:
                        break
                continue
            # A child hanging with no result means the relay died mid-run:
            # re-probe before burning another child's worth of the capture
            # window on it.
            child_errs.append(f"child {attempt} timed out after {CHILD_TIMEOUT:.0f}s")
            print(child_errs[-1], file=sys.stderr, flush=True)
            if not _relay_reachable() and not os.environ.get("FVAD_BENCH_SKIP_PROBE"):
                if results:
                    break
                _fail("relay_down_midrun", "; ".join(child_errs))
            continue
        got = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                got = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        if got is not None and got.get("value"):
            results.append(got)
        else:
            child_errs.append(
                f"child {attempt} failed (rc={proc.returncode}): "
                + proc.stderr.strip()[-2000:]
            )
            print(child_errs[-1], file=sys.stderr, flush=True)
        if len(results) >= 2:
            vals = sorted(r["value"] for r in results)
            if vals[-1] <= 1.3 * vals[-2]:  # two runs agree: done
                break
    if not results:
        _fail("no_child_result", "; ".join(e[:160] for e in child_errs))
    best = max(results, key=lambda r: r["value"])
    for mode in (
        "bf16", "bf16_io", "high", "bf16_deep", "highest_deep",
        "bf16_io_flat", "bf16_flat", "highest_wide", "serve", "serve_dense",
    ):
        if mode in best.get("modes", {}):
            continue
        # Adopt a fast-mode number only from a child whose HEADLINE agreed
        # with the best (within the same 30% bound) — a child on a throttled
        # relay connection under-reports both modes, and its numbers must
        # not be published just because it was the only child measuring them.
        donors = [
            r for r in results
            if mode in r.get("modes", {}) and r["value"] >= best["value"] / 1.3
        ]
        if donors:
            best["modes"][mode] = max(
                donors,
                key=lambda d: d["modes"][mode].get(
                    "realtime_factor",
                    d["modes"][mode].get("streams_per_chip_est", 0),
                ),
            )["modes"][mode]
    print(json.dumps(best))


def _run_host_calls(fe_call, st, n: int) -> float:
    """Shared host-FSM measurement loop: dispatch n front-end calls via
    ``fe_call(i) -> (mv, rt, va)`` device arrays (implementations thread
    their own carried state), starting async D2H copies at dispatch time,
    then decode every call's window inputs in native code. Honest
    end-to-end cost: the timed region includes the fetch and the decode,
    software-pipelined the way production runs (the decode of call i
    overlaps the device work of later calls)."""
    import numpy as np

    from formula_vad_tpu.pipeline import fsm_host

    t0 = time.perf_counter()
    handles = []
    for i in range(n):
        h = fe_call(i)
        for x in h:
            try:
                x.copy_to_host_async()
            except AttributeError:
                pass
        handles.append(h)
    ev = None
    for mv, rt, va in handles:
        out = fsm_host.scan_windows_host(
            st.fsm_shape, st.fsm_params,
            np.asarray(mv), np.asarray(rt), np.asarray(va),
        )
        ev = out.event  # np.asarray blocked until real completion
    assert ev is not None
    return time.perf_counter() - t0


def _slope(run, n_short: int, n_long: int) -> float:
    """Shared slope policy: per-call time as the slope between a short and a
    long run (fixed sync/queue overheads cancel). Relay hiccups occasionally
    produce dt_short > proportional dt_long (even negative slopes); a sane
    slope is positive and within ~3x of the inclusive per-call average.
    Retry up to 3x, then fall back to the average (an upper bound that
    still counts every real cost)."""
    run(1)  # compile + decoder warm-up
    for _ in range(3):
        dt_short = run(n_short)
        dt_long = run(n_long)
        slope = (dt_long - dt_short) / (n_long - n_short)
        avg = dt_long / n_long
        if 0.3 * avg <= slope <= 3.0 * avg:
            return slope
    return avg


def _slope_sample(run, n_short: int, n_long: int) -> float:
    """ONE slope sample (no warm-up, no retry): a single short+long pair.
    The interleaved-rep loop takes k of these per tier and publishes the
    median, so per-sample robustness comes from the rep dimension rather
    than an inner retry; the avg fallback still guards against a relay
    hiccup making the slope insane (negative / >3x the inclusive mean)."""
    dt_short = run(n_short)
    dt_long = run(n_long)
    slope = (dt_long - dt_short) / (n_long - n_short)
    avg = dt_long / n_long
    if 0.3 * avg <= slope <= 3.0 * avg:
        return slope
    return avg


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _make_sentinel_run():
    """Fixed-work relay/throughput sentinel: a bf16 matmul chain with a
    4-byte device-side-reduce fetch, measured by the same slope machinery
    as the tiers. Its per-call ms is constant on an unthrottled connection
    (~2 ms on a v5e at the default 2048x2048x16 chain); a throttled
    process or a mid-capture slowdown shows up as an inflated start_ms or
    an end/start ratio away from 1 — the capture self-labels instead of a
    tier silently absorbing the throttle (VERDICT r3 next-#1)."""
    import jax
    import jax.numpy as jnp

    dim = int(os.environ.get("BENCH_SENTINEL_DIM", "2048"))
    depth = int(os.environ.get("BENCH_SENTINEL_DEPTH", "16"))
    w = jax.random.normal(jax.random.PRNGKey(7), (dim, dim), jnp.bfloat16)
    w = w / jnp.sqrt(jnp.float32(dim)).astype(jnp.bfloat16)

    @jax.jit
    def chain(x):
        y = x
        for _ in range(depth):
            # tanh keeps the chain non-linear so XLA cannot reassociate or
            # fold the matmuls; the scale keeps values in tanh's live range.
            y = jnp.tanh(jnp.matmul(y, w, precision=jax.lax.Precision.DEFAULT))
        return jnp.max(jnp.abs(y.astype(jnp.float32)))

    x = jax.random.normal(jax.random.PRNGKey(8), (dim, dim), jnp.bfloat16)

    def run(n: int) -> float:
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = chain(x)
        float(r)
        return time.perf_counter() - t0

    run(1)  # compile outside the timed samples
    return run


def _sentinel_ms(run) -> float:
    return _slope_sample(run, 2, 8) * 1e3


def _throttle_kept_rounds(sent_series, n_rounds: int, tol: float) -> list:
    """Indices of rep rounds whose BOTH bracketing sentinel samples are
    within `tol` of the capture's best sample. A round adjacent to an
    inflated sample ran (at least partly) in a throttled window and is
    excluded from the published median; with a missing/misaligned series
    every round is kept (filtering disabled, raw stats only)."""
    if len(sent_series) != n_rounds + 1:
        return list(range(n_rounds))
    best = min(sent_series)
    return [
        r for r in range(n_rounds)
        if max(sent_series[r], sent_series[r + 1]) <= tol * best
    ]


_OOM_PAT = re.compile(
    r"RESOURCE_EXHAUSTED|out of memory|OOM|Allocat", re.IGNORECASE
)


def _walk_dense_ladder(ladder, measure_rung, past_deadline, anchor=0):
    """Descend the serve_dense ladder and bracket the per-chip ceiling
    with measurements (VERDICT r4 next-#4).

    ladder: [(streams, microbatch), ...] largest-capacity first.
    measure_rung(b, m) -> row dict (raises on OOM/config error).
    past_deadline() -> bool (middle rungs are skipped past it; the final,
    smallest rung is always attempted so a degraded capture still
    publishes a measured point).

    Returns (row, first_fail, attempts): `row` is the largest rung that
    measured IN budget (or, if none fit, the smallest measured rung —
    over budget — as a degraded fallback); `first_fail` is the tightest
    capacity failure above the pass — a measured over-budget tick or an
    OOM'd rung (non-capacity errors like bad configs are recorded in
    `attempts` but never bracket); `attempts` lists every non-published
    rung outcome in descent order.

    anchor: past the deadline, rungs LARGER than this are skipped but the
    anchor rung and everything below it are still attempted — a degraded
    capture should fall back to the proven record rung (27,648 in the
    default ladder), not to the smallest rung."""
    attempts, row, first_fail = [], None, None
    for i, (bb, mm) in enumerate(ladder):
        last = i == len(ladder) - 1
        if attempts and past_deadline() and not last and bb > anchor:
            attempts.append(
                {"streams": bb, "microbatch": mm, "skipped": "deadline"}
            )
            continue
        try:
            cand = measure_rung(bb, mm)
        except Exception as e:
            att = {"streams": bb, "microbatch": mm, "error": repr(e)[:160]}
            attempts.append(att)
            if _OOM_PAT.search(repr(e)):
                first_fail = att  # capacity failure: OOM'd rung
            print(f"serve_dense rung B={bb} m={mm} failed: {e!r}",
                  file=sys.stderr, flush=True)
            continue
        if cand.get("fits_500ms_budget"):
            row = cand
            break
        # Measured but over budget: the real failure mode the bracket
        # wants — keep its tick and continue downward. (Descending order
        # means the LAST such rung before the pass is the tightest
        # measured bound on the ceiling.)
        att = {"streams": bb, "microbatch": mm,
               "tick_ms": cand["tick_ms"], "over_budget": True}
        attempts.append(att)
        first_fail = att
        row = cand  # degraded fallback: published if nothing fits
    return row, first_fail, attempts


def _measure_serving_tick(b: int, params, st, n_short: int, n_long: int,
                          collect_denoised: bool = True, microbatch: int = 1,
                          pcm16: bool = False, input_sets: int = 2) -> dict:
    """One online-serving tick at B lockstep streams (the OnlineBatchServer
    step): vmapped chunk_step over B carried states + the additive native
    host-FSM decode — the same tick definition as benchmarks/online_scale.py.
    Inputs are device-resident (the per-tick ~192 KB/stream H2D is PCIe work
    on a production host and relay-bound here — parallel/online.py::push
    notes). Measured at serving precision (bf16 matmuls).

    ``microbatch=m`` splits the tick into m sequential B/m-row shard
    dispatches (OnlineBatchServer(microbatch=m)): carries stay resident,
    the step's TRANSIENT activations — the measured HBM binder past ~14k
    streams — shrink by m. ``pcm16`` holds the resident inputs as raw
    int16 and dequantizes on device (the server's production PCM16
    ingestion path; exact i/32768 in f32). ``input_sets=1`` drops the
    benchmark's input double-buffer (verified same-vs-distinct ratio 1.0)
    — a BENCHMARK cost production doesn't pay, only relevant near the HBM
    ceiling."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from formula_vad_tpu.pipeline import fsm_host, vad

    host_fsm = fsm_host.available()
    m = microbatch
    if b % m:
        raise ValueError(f"B={b} must be a multiple of microbatch={m}")
    sh = b // m

    def batched_step(carries, chunks, valid, start):
        # shared_start: the lockstep shared-fill dispatch OnlineBatchServer
        # uses in production (one contiguous framing slice, no per-row
        # gather — benchmarks/tick_bisect.py measured the gather at ~3 ms
        # of the B=1024 tick).
        if pcm16:
            # The server's on-device dequant (parallel/online.py::dequant).
            chunks = chunks.astype(jnp.float32) / np.float32(32768.0)
        return jax.vmap(
            lambda c, a, v: vad.chunk_step(
                params, st, c, a, chunk_valid=v, run_fsm=not host_fsm,
                collect_denoised=collect_denoised, shared_start=start,
            )
        )(carries, chunks, valid)

    jstep = jax.jit(batched_step)
    fill = {"v": 0}

    def step(carries_m, chunks_m, valid):
        # One tick = m sequential shard dispatches (the server's microbatch
        # loop, parallel/online.py::_run_step).
        start = jnp.int32(st.fft_size - fill["v"])
        new_c, outs = [], []
        for s in range(m):
            c2, o = jstep(carries_m[s], chunks_m[s], valid, start)
            new_c.append(c2)
            outs.append(o)
        fill["v"] = (fill["v"] + st.chunk_size) % st.fft_size
        return new_c, outs

    carries = [
        jax.vmap(lambda _: vad.init_carry(st))(jnp.arange(sh)) for _ in range(m)
    ]

    def gen(key):
        x = 0.02 * jax.random.normal(
            key, (sh, st.n_channels, st.chunk_size), jnp.float32
        )
        if pcm16:
            return jnp.clip(jnp.round(x * 32768.0), -32768, 32767).astype(jnp.int16)
        return x

    jgen = jax.jit(gen)
    chunks = [
        [jgen(jax.random.PRNGKey(2 * i * m + s)) for s in range(m)]
        for i in range(input_sets)
    ]
    valid = jnp.ones((sh,), bool)

    def _sync(out):
        # max-abs, not sum: XLA folds linear reductions through matmuls.
        float(jnp.max(jnp.abs(out.min_vol)))

    def run(n):
        c = carries
        fill["v"] = 0  # each run restarts from the initial carries
        outs = None
        t0 = time.perf_counter()
        for i in range(n):
            c, outs = step(c, chunks[i % input_sets], valid)
        # Devices execute in enqueue order: the LAST shard's output
        # completing implies the whole tick did (m syncs would add m fixed
        # relay round trips).
        _sync(outs[-1])
        return time.perf_counter() - t0

    # Same rep/median discipline as the precision tiers (the serve claims
    # were the other round-3 single-shot casualty: driver 18.88 ms vs
    # local 13.4-14.6 ms with nothing to arbitrate).
    run(1)  # compile + warm-up
    n_reps = max(1, int(os.environ.get("BENCH_SERVE_REPS", "3")))
    ticks = [_slope_sample(run, n_short, n_long) for _ in range(n_reps)]
    tick = _median(ticks)
    tick_min, tick_max = min(ticks), max(ticks)

    decode_ms = 0.0
    if host_fsm:
        fill["v"] = 0  # consistent framing for the fresh initial carries
        _, outs0 = step(carries, chunks[0], valid)
        mv = np.concatenate([np.asarray(o.min_vol) for o in outs0])
        rt = np.concatenate([np.asarray(o.ratios) for o in outs0])
        va = np.concatenate([np.asarray(o.window_valid) for o in outs0])
        wb = np.concatenate([np.asarray(o.win_indices)[:, 0] for o in outs0])
        hc = fsm_host.init_host_carry(st.fsm_shape, st.fsm_params, b)
        t0 = time.perf_counter()
        n_dec = 10
        for _ in range(n_dec):
            fsm_host.scan_windows_host(
                st.fsm_shape, st.fsm_params, mv, rt, va, carry=hc, win_base=wb
            )
        decode_ms = (time.perf_counter() - t0) / n_dec * 1e3
        tick += decode_ms / 1e3
    return {
        "streams": b,
        "tick_ms": round(tick * 1e3, 2),
        "tick_ms_min": round(tick_min * 1e3 + decode_ms, 2),
        "tick_ms_max": round(tick_max * 1e3 + decode_ms, 2),
        "reps": n_reps,
        "decode_ms": round(decode_ms, 2),
        "fsm": "host" if host_fsm else "pallas",
        "events_only": not collect_denoised,
        "microbatch": m,
        "pcm16": pcm16,
        "fits_500ms_budget": tick < 0.5,
        "streams_per_chip_est": int(b * 0.5 / tick),
    }


def _measure_mode_host(fe_fn, st, audios, n_short, n_long) -> float:
    """Host-FSM path: device front-end + fetched window inputs + native
    decode (see _run_host_calls for the accounting)."""
    n_aud = len(audios)

    def run(n: int) -> float:
        return _run_host_calls(lambda i: fe_fn(audios[i % n_aud]), st, n)

    return _slope(run, n_short, n_long)


def _measure_mode_host_pipe(make_fns, st, audios, n_short, n_long) -> float:
    """Pipelined host-FSM path (FVAD_BENCH_PIPELINE=on|deep, PARITY.md
    dev. 12): call i consumes its precomputed segment product and computes
    call i+1's product inside its own GRU scan (deep mode additionally
    defers each slab's FF head into the next call's scan). Same accounting
    as _measure_mode_host; the prologue product is computed once per run
    and cancels in the slope."""
    init_state, prod_fn, fe = make_fns()
    n_aud = len(audios)

    def run(n: int) -> float:
        state = init_state()
        prod = prod_fn(audios[0])

        def call(i):
            nonlocal state, prod
            mv, rt, va, prod, state = fe(
                audios[i % n_aud], prod, state, audios[(i + 1) % n_aud]
            )
            return mv, rt, va

        return _run_host_calls(call, st, n)

    return _slope(run, n_short, n_long)


def measure() -> None:
    import jax

    if os.environ.get("FVAD_BENCH_CPU"):
        # Local validation path (relay down / no chip): force the CPU
        # backend the same way tests/conftest.py does — the container's
        # sitecustomize pins JAX_PLATFORMS=axon, so only jax.config works.
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("FVAD_JAX_CACHE", "/tmp/jax_cache_fvad")
    if cache_dir:
        # Persistent compilation cache: the 2-3 children recompile the same
        # programs; every compile burns relay capture time. Guarded — a
        # backend that cannot serialize executables just skips caching.
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np

    from formula_vad_tpu.config import VADConfig
    from formula_vad_tpu.models import nsnet2
    from formula_vad_tpu.ops import precision
    from formula_vad_tpu.pipeline import offline, vad

    t_start = time.monotonic()

    n_streams = int(os.environ.get("BENCH_STREAMS", "21"))
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "40"))  # 20 s per stream per call
    n_short = max(1, int(os.environ.get("BENCH_ITERS_SHORT", "3")))
    n_long = max(n_short + 1, int(os.environ.get("BENCH_ITERS_LONG", "15")))

    params = nsnet2.load(None)
    st = vad.statics_from_config(VADConfig())
    chunk_sec = st.chunk_size / st.sample_rate
    audio_sec = n_streams * n_chunks * chunk_sec
    gflops_per_audio_sec = flops_per_audio_sec(st) / 1e9

    platform = jax.devices()[0].platform
    use_pallas = platform != "cpu"
    from formula_vad_tpu.pipeline import fsm_host

    # FSM placement mirrors the runners' default: host decode (front-end-
    # only device step + native FSM) — the timed loop includes the D2H
    # fetch and the decode, pipelined via copy_to_host_async at dispatch
    # time. Measured even through the relay tunnel this beats the device-
    # complete Pallas step (f32 31.6 vs 34.5 ms/call) because the async
    # copies overlap device compute; without them the serial fetch costs
    # ~10x the step (benchmarks/host_fsm_ab.py). FVAD_BENCH_FSM=pallas
    # forces the device-complete step.
    fsm_choice = os.environ.get("FVAD_BENCH_FSM", "host")
    use_host_fsm = fsm_host.available() and fsm_choice == "host"

    def make_batch_fn():
        # A FRESH function object per precision mode: JAX's trace cache is
        # keyed on function identity, so re-jitting the same closure after
        # set_matmul_precision would silently reuse the stale-precision
        # jaxpr (measured: both modes identical without this).
        def batch_fn(audio):
            win_out, valid = offline.process_batch_offline(
                params, st, audio, use_pallas_fsm=use_pallas
            )
            # Only the tiny event tensors leave the device.
            return win_out.event, win_out.seg_valid

        return batch_fn

    def make_fe_fn():
        # Host-FSM path's device part (fresh per mode, same trace-cache rule).
        def fe_fn(audio):
            return offline.window_inputs_batch(params, st, audio)

        return fe_fn

    # Cross-slab overlapped device step: FVAD_BENCH_PIPELINE=flat computes
    # slab s+1's segment product as an independent flat op in slab s's
    # program (materialize path; XLA schedules the overlap; bitwise-trivial
    # — offline.window_inputs_flat); =on/=deep are the rider forms
    # (composite path, PARITY.md deviation 12 — measured LOSSES on chip,
    # kept as evidence). Defaults flip only after an on-chip A/B win.
    pipe_mode = os.environ.get("FVAD_BENCH_PIPELINE", "off")
    use_pipeline = use_host_fsm and (
        (pipe_mode in ("on", "deep") and offline.band_composite_enabled())
        or (pipe_mode == "flat" and not offline.band_composite_enabled())
    )

    def _init_dc():
        return jax.vmap(
            lambda _: offline.init_slab_carry(st.n_channels, st.downsample_rate)
        )(jnp.arange(n_streams))

    def _prod0(audio):
        return offline.segmat_prod(audio, None, st.downsample_rate)

    # The rider/deep modes reproduce the FUSED basis program row-sliced;
    # their slab-0 product and bitwise-gate references must pin
    # predecim=False so the chain stays one program (PARITY.md dev. 13).
    # The flat mode's prod op is the same segmat_prod everywhere, so it
    # follows the shipping default (_prod0).
    def _prod0_fused(audio):
        return offline.segmat_prod(audio, None, st.downsample_rate, predecim=False)

    def make_pipe_fns():
        def fe(audio, prod, dc, audio_next):
            dc, mv, rt, va, prod_next = offline.window_inputs_batch_pipelined(
                params, st, audio, prod, dc, audio_next
            )
            return mv, rt, va, prod_next, dc

        return jax.jit(_init_dc), jax.jit(_prod0_fused), jax.jit(fe)

    def make_flat_fns():
        def fe(audio, prod, dc, audio_next):
            dc, mv, rt, va, prod_next = offline.window_inputs_batch_flat(
                params, st, audio, prod, dc, audio_next
            )
            return mv, rt, va, prod_next, dc

        return jax.jit(_init_dc), jax.jit(_prod0), jax.jit(fe)

    def make_deep_fns():
        def init_state():
            dc = _init_dc()
            dp = jax.vmap(
                lambda _: offline.init_deep_state(
                    st.n_channels, n_chunks, st.fft_size, st.downsample_rate
                )
            )(jnp.arange(n_streams))
            return dp, dc

        def fe(audio, prod, state, audio_next):
            dp, dc = state
            dc, dp, (mv, rt, va), prod_next = offline.window_inputs_batch_deep(
                params, st, audio, prod, dp, dc, audio_next
            )
            return mv, rt, va, prod_next, (dp, dc)

        return jax.jit(init_state), jax.jit(_prod0_fused), jax.jit(fe)

    # Inputs are generated ON DEVICE (only the 4-byte PRNG key crosses the
    # tunnel): through the relay's ~10-25 MB/s H2D, shipping 3x160 MB of
    # noise from numpy used to cost minutes of the capture window.
    def make_audios(b):
        gen = jax.jit(
            lambda key: 0.02
            * jax.random.normal(key, (b, 2, n_chunks * st.chunk_size), jnp.float32)
        )
        return [gen(jax.random.PRNGKey(i)) for i in range(3)]

    audios = make_audios(n_streams)

    # (name, matmul precision, activation-storage dtype): bf16_io adds bf16
    # storage for the big intermediates on top of bf16 matmuls — the deepest
    # throughput tier (precision.set_io_dtype; tests/test_bf16_io.py pins
    # decision parity on the synthetic corpus); `high` is the bf16_3x
    # middle rung (~f32 mantissa quality from 3 MXU passes), a first-class
    # table row since round 4 so it shares the interleaved-rep discipline.
    mode_list = [
        ("highest", "highest", "f32"),
        ("bf16", "default", "f32"),
        ("bf16_io", "default", "bf16"),
        ("high", "high", "f32"),
    ]
    wanted = os.environ.get("BENCH_MODES", "")
    if wanted:
        names = {m.strip() for m in wanted.split(",") if m.strip()}
        mode_list = [m for m in mode_list if m[0] in names]
        if not mode_list:
            _fail("bad_modes", f"BENCH_MODES={wanted!r} matches no tier")
    n_reps = max(1, int(os.environ.get("BENCH_REPS", "3")))

    sentinel = None
    modes = {}

    def _mode_row(rtf_all) -> dict:
        rtf = _median(rtf_all)
        tflops = rtf * gflops_per_audio_sec / 1e3
        return {
            "realtime_factor": round(rtf, 1),
            "rtf_min": round(min(rtf_all), 1),
            "rtf_max": round(max(rtf_all), 1),
            "reps": len(rtf_all),
            "tflops_achieved": round(tflops, 2),
            "mfu": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
        }

    if use_pipeline:
        # Env-forced diagnostic path (measured-dead-end evidence runs): the
        # pipelined fns thread cross-call state, so keep the original
        # blocked per-tier measurement here.
        for mode_name, level, io in mode_list:
            precision.set_matmul_precision(level)
            precision.set_io_dtype(io)
            per_call = _measure_mode_host_pipe(
                {"deep": make_deep_fns, "flat": make_flat_fns}.get(
                    pipe_mode, make_pipe_fns
                ),
                st, audios, n_short, n_long,
            )
            modes[mode_name] = _mode_row([audio_sec / per_call])
    else:
        # Phase 1 — compile every tier first: one FRESH jitted fn per tier,
        # traced while that tier's precision globals are set. JAX's trace
        # cache is keyed on function identity, so each executable keeps its
        # tier's program no matter what the globals say at later calls —
        # which is exactly what lets the timed reps interleave.
        runs = []
        for mode_name, level, io in mode_list:
            precision.set_matmul_precision(level)
            precision.set_io_dtype(io)
            if use_host_fsm:
                fe = jax.jit(make_fe_fn())

                def run(n: int, fe=fe) -> float:
                    return _run_host_calls(
                        lambda i: fe(audios[i % len(audios)]), st, n
                    )
            else:
                fn = jax.jit(make_batch_fn())

                def run(n: int, fn=fn) -> float:
                    t0 = time.perf_counter()
                    ev = None
                    for i in range(n):
                        ev, _ = fn(audios[i % len(audios)])
                    float(jnp.sum(ev))  # device-side reduce: real sync
                    return time.perf_counter() - t0

            run(1)  # compile + decoder warm-up under this tier's globals
            runs.append((mode_name, run))
        precision.set_matmul_precision("highest")
        precision.set_io_dtype("f32")

        sent_run = None
        # Default the sentinel ON only for full-table captures: a tier-
        # subset run (BENCH_MODES set — chip_gate's sanity stage, parent
        # retry attempts) stays lean.
        if os.environ.get("BENCH_SENTINEL", "0" if wanted else "1") != "0":
            try:
                sent_run = _make_sentinel_run()
            except Exception as e:
                print(f"sentinel probe failed: {e!r}", file=sys.stderr, flush=True)

        # Phase 2 — k interleaved rep ROUNDS, round-robin over tiers (NOT
        # blocked per tier): a throttled window or drift hits every tier's
        # rep r alike instead of silently halving whichever tier ran last.
        # Each round is BRACKETED by a fixed-work sentinel sample (one
        # before round 0, one after every round): BENCH_r04's block-level
        # bracket (ratio 1.066) co-existed with 2.2x per-rep tier spreads
        # because the throttle hit *between* the brackets — per-round
        # samples label exactly which rounds ran throttled (VERDICT r4
        # next-#1a).
        samples: dict = {name: [] for name, _ in runs}
        sent_series: list = []

        def _sent_sample() -> None:
            nonlocal sent_run
            if sent_run is None:
                return
            try:
                sent_series.append(round(_sentinel_ms(sent_run), 3))
            except Exception as e:
                # A failed sample would misalign the round<->bracket
                # mapping; disable filtering, publish raw stats only.
                print(f"sentinel sample failed: {e!r}", file=sys.stderr, flush=True)
                sent_run = None
                sent_series.clear()

        def _do_round() -> None:
            for name, run in runs:
                samples[name].append(_slope_sample(run, n_short, n_long))
            _sent_sample()

        def _n_rounds() -> int:
            return len(next(iter(samples.values())))

        _sent_sample()
        for _rep in range(n_reps):
            _do_round()

        # Throttle-aware statistic (VERDICT r4 next-#1b): a rep round is
        # KEPT iff both adjacent sentinel samples are within
        # BENCH_SENTINEL_TOL of the capture's best sample; the published
        # realtime_factor is the median over kept rounds, with the raw
        # (all-round) median alongside so nothing is hidden.
        sent_tol = float(os.environ.get("BENCH_SENTINEL_TOL", "1.10"))

        def _kept_rounds() -> list:
            return _throttle_kept_rounds(sent_series, _n_rounds(), sent_tol)

        # Adaptive escalation (VERDICT r4 next-#1c): add rounds (up to
        # BENCH_REPS_MAX) while any tier's kept-round spread exceeds
        # BENCH_SPREAD_TOL or filtering leaves <2 usable rounds — a
        # median of 3 under a 2x spread cannot rank tiers ~10% apart.
        reps_max = max(n_reps, int(os.environ.get("BENCH_REPS_MAX", "7")))
        spread_tol = float(os.environ.get("BENCH_SPREAD_TOL", "1.15"))

        def _needs_more() -> bool:
            kept = _kept_rounds()
            if len(kept) < 2:
                return True
            for vals in samples.values():
                kv = [vals[r] for r in kept]
                if max(kv) / max(min(kv), 1e-12) > spread_tol:
                    return True
            return False

        while _n_rounds() < reps_max and _needs_more():
            _do_round()

        kept = _kept_rounds()
        total = _n_rounds()
        for name, _run in runs:
            rtf_all = [audio_sec / pc for pc in samples[name]]
            row = _mode_row(rtf_all)  # raw stats over every round
            if kept and len(kept) < total:
                # Filtered headline + raw median side by side; rtf_min/max
                # stay raw so the full spread is always visible.
                row["rtf_median_raw"] = row["realtime_factor"]
                filt = _mode_row([rtf_all[r] for r in kept])
                row["realtime_factor"] = filt["realtime_factor"]
                row["tflops_achieved"] = filt["tflops_achieved"]
                row["mfu"] = filt["mfu"]
            row["reps_kept"] = len(kept)
            modes[name] = row

        if sent_series:
            sentinel = {
                # start/end/ratio kept for artifact-shape continuity with
                # BENCH_r03/r04; samples_ms is the per-round series.
                "start_ms": sent_series[0],
                "end_ms": sent_series[-1],
                "ratio": round(sent_series[-1] / max(sent_series[0], 1e-9), 3),
                "samples_ms": sent_series,
                "best_ms": min(sent_series),
                "spread": round(
                    max(sent_series) / max(min(sent_series), 1e-9), 3
                ),
                "tol": sent_tol,
                "rounds_kept": len(kept),
                "rounds_total": total,
            }

    def emit() -> None:
        # Headline comes from the 'highest' tier; under a BENCH_MODES
        # subset the fallback row's tier is recorded as value_tier so the
        # artifact can never silently carry an unnamed tier's number
        # (ADVICE r4).
        head_tier = "highest" if "highest" in modes else next(iter(modes))
        head = modes[head_tier]
        try:  # artifact self-identification (BENCH_rNN -> commit)
            rev = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True, timeout=5,
            ).stdout.strip() or None
        except (subprocess.SubprocessError, OSError):
            rev = None
        out = {
            "metric": "realtime_factor",
            "value": head["realtime_factor"],
            "rev": rev,
            "unit": "audio_sec/sec/chip",
            "vs_baseline": round(head["realtime_factor"] / 5000.0, 3),
            "tflops_achieved": head["tflops_achieved"],
            "mfu": head["mfu"],
            "fsm": "host" if use_host_fsm else "pallas",
            "pipelined": pipe_mode if use_pipeline else False,
            "modes": modes,
        }
        if head_tier != "highest":
            out["value_tier"] = head_tier
        if sentinel is not None:
            out["sentinel"] = sentinel
        print(json.dumps(out), flush=True)

    # Early emit: the standard table is on stdout BEFORE any extra row runs.
    # The parent takes the LAST parseable JSON line — and salvages this one
    # from the killed child's partial stdout if an extra row ever blows the
    # child timeout, so extras can never cost the headline.
    emit()

    # --- self-gated extra rows --------------------------------------------
    # Driver-visible evidence for the round-3 levers even if the standalone
    # A/B queue (benchmarks/pipeline_ab.py, batch_scale.py) never gets chip
    # time before the capture: bf16_deep measures the stage-2 cross-slab
    # pipelined step alongside its OWN bitwise gate (PARITY.md deviation 12
    # — publishable as decision-identical only when gate_bitwise is true);
    # highest_wide measures the plain step at 2x the stream width (ROOFLINE
    # "Scaling note": ~15% measured f32 win at B>=42; bf16 is fastest AT
    # B=21); serve measures one online tick at B lockstep streams. The
    # headline never depends on either row, and a time budget guarantees
    # the standard table always lands inside the child timeout.
    extra_deadline = t_start + float(
        os.environ.get("BENCH_EXTRA_DEADLINE", str(min(900.0, 0.6 * CHILD_TIMEOUT)))
    )
    # NOTE: no band_composite_enabled() term here — when band_fold_ab
    # flipped the composite default OFF (fb4fd37) that term silently
    # disabled EVERY extra row including serve (caught by
    # tests/test_bench_cpu.py). Only the deep rows are composite-only;
    # they force the composite path themselves below.
    want_extras = (
        os.environ.get("BENCH_EXTRAS", "1") != "0"
        and not os.environ.get("BENCH_MODES")  # tier subset: table-only run
        and not use_pipeline  # explicit FVAD_BENCH_PIPELINE: already measured
        and use_host_fsm
    )
    # The cross-slab overlap rows (flat/rider/deep) are all MEASURED dead
    # ends on chip (pipeline_ab 2026-08-19: plain wins every mode; ROOFLINE
    # dead-end sections) — they stay available behind BENCH_DEADEND_ROWS=1
    # for re-measurement but no longer spend the default capture window.
    want_deadend_rows = want_extras and os.environ.get("BENCH_DEADEND_ROWS") == "1"
    # (`high` moved into the main interleaved tier table in round 4 — it
    # shares the rep/median discipline instead of a single extras shot.)
    if want_deadend_rows:
        # flat rows: the materialize-path cross-slab overlap
        # (offline.window_inputs_flat) whose product carry is
        # bitwise-trivial (same segmat_prod op, different program).
        # Self-gated: the exact-equality check runs in-process alongside
        # the number.
        for row, level, io in (
            ("bf16_io_flat", "default", "bf16"),
            ("bf16_flat", "default", "f32"),
        ):
            if time.monotonic() >= extra_deadline:
                break
            precision.set_matmul_precision(level)
            precision.set_io_dtype(io)
            try:
                init_dc, prod_fn, flat_fe = make_flat_fns()
                plain_fe = jax.jit(make_fe_fn())
                dc0 = init_dc()
                p0 = prod_fn(audios[0])
                tail = 160 * st.downsample_rate
                f_mv, f_rt, f_va, p1, _ = flat_fe(audios[0], p0, dc0, audios[1])
                want_p1 = jax.jit(
                    lambda a, t: offline.segmat_prod(a, t, st.downsample_rate)
                )(audios[1], audios[0][..., -tail:])
                p_mv, p_rt, p_va = plain_fe(audios[0])
                gate = bool(
                    jnp.all(p1 == want_p1)
                    & jnp.all(f_mv == p_mv)
                    & jnp.all(f_rt == p_rt)
                    & jnp.all(f_va == p_va)
                )
                per_call = _measure_mode_host_pipe(
                    lambda: (init_dc, prod_fn, flat_fe), st, audios,
                    n_short, n_long,
                )
                rtf = audio_sec / per_call
                tflops = rtf * gflops_per_audio_sec / 1e3
                modes[row] = {
                    "realtime_factor": round(rtf, 1),
                    "tflops_achieved": round(tflops, 2),
                    "mfu": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
                    "gate_bitwise": gate,
                }
            except Exception as e:
                print(f"{row} extra row failed: {e!r}", file=sys.stderr, flush=True)
    if want_extras:
        # serve: one online tick at B lockstep streams — the
        # driver-visible record for the serving scale claim (VERDICT
        # round-2 missing #3); full curve: benchmarks/online_scale.py.
        if os.environ.get("BENCH_SERVE", "1") != "0":
            precision.set_matmul_precision("default")
            precision.set_io_dtype("f32")
            try:
                sb = int(os.environ.get("BENCH_SERVE_STREAMS", "1024"))
                modes["serve"] = _measure_serving_tick(
                    sb, params, st, n_short, n_long
                )
            except Exception as e:
                print(f"serve extra row failed: {e!r}", file=sys.stderr, flush=True)
        if (os.environ.get("BENCH_SERVE_DENSE", "1") != "0"
                and time.monotonic() < extra_deadline):
            # serve_dense: the production densest-tier tick — events-only
            # (denoised audio never leaves the device) + bf16 activation
            # storage + PCM16 ingestion (the server's int16 push path) —
            # climbing a LADDER from near the measured 36k-stream ceiling
            # down, so the driver capture carries a MEASURED tick at the
            # knife edge instead of a linear extrapolation from B=4,608
            # (VERDICT r3 next-#2). Graceful fallback: an OOM'd or
            # deadline-skipped rung is recorded in the row, and the first
            # rung that completes a tick is published.
            precision.set_matmul_precision("default")
            precision.set_io_dtype("bf16")
            ladder_env = os.environ.get("BENCH_SERVE_DENSE_LADDER")
            db = os.environ.get("BENCH_SERVE_DENSE_STREAMS")
            if ladder_env:
                ladder = []
                for item in ladder_env.split(","):
                    bstr, _, mstr = item.partition(":")
                    ladder.append((int(bstr), int(mstr or "1")))
            elif db:  # explicit single point (tests / chip_gate tuning)
                ladder = [(int(db), 1)]
            else:
                # Round 5 (VERDICT r4 next-#4): start ABOVE the r04-measured
                # 27,648 so the official record brackets the per-chip
                # ceiling with measurements — largest in-budget rung
                # published + the adjacent capacity failure (over-budget
                # tick or OOM) recorded as `first_fail` — instead of a
                # streams_per_chip_est extrapolation (est was 37,661).
                # 39,936 sits between the reproduced 36,864 pass and the
                # 43,008 fail (ticks 572/567/581 ms in three processes) —
                # projected ~522 ms, so it tightens the bracket to ~8%
                # whichever way it lands.
                ladder = [(43008, 4), (39936, 4), (36864, 3), (36864, 4),
                          (32256, 3), (27648, 3), (13824, 3), (4608, 1)]
            def _rung(bb, mm):
                return _measure_serving_tick(
                    bb, params, st, n_short, n_long,
                    collect_denoised=False, microbatch=mm,
                    pcm16=True, input_sets=1,
                )

            row, first_fail, attempts = _walk_dense_ladder(
                ladder, _rung, lambda: time.monotonic() >= extra_deadline,
                anchor=int(os.environ.get("BENCH_SERVE_DENSE_ANCHOR", "27648")),
            )
            if row is not None:
                row["io_dtype"] = "bf16"
                # Attach the bracketing failure unless the published row IS
                # that over-budget measurement (nothing smaller fit).
                row_is_the_fail = (
                    first_fail is not None
                    and first_fail.get("streams") == row["streams"]
                    and first_fail.get("microbatch") == row["microbatch"]
                    and not row.get("fits_500ms_budget", True)
                )
                if first_fail is not None and not row_is_the_fail:
                    row["first_fail"] = first_fail
                if attempts:
                    row["fallback_from"] = attempts
                modes["serve_dense"] = row
            elif attempts:
                # Nothing measured: record the boundary explicitly rather
                # than dropping the row (distinguishing failed rungs from
                # deadline-skipped ones via the per-rung entries).
                modes["serve_dense"] = {
                    "streams": 0, "error": "no ladder rung completed",
                    "fallback_from": attempts,
                }
            precision.set_io_dtype("f32")
        if time.monotonic() < extra_deadline:
            # Wider batch at HEADLINE precision: a scaling-evidence row.
            # batch_scale.py (2026-08-19, ROOFLINE "Scaling note") measures
            # B=21 as the per-chip optimum in EVERY precision now (the
            # round-2 f32 wide win disappeared with the leaner step); this
            # row documents that throughput stays near-flat at 2x width
            # (~0.97x) rather than claiming a win.
            precision.set_matmul_precision("highest")
            precision.set_io_dtype("f32")
            try:
                wide = int(os.environ.get("BENCH_WIDE_STREAMS", str(2 * n_streams)))
                audios_w = make_audios(wide)
                per_call = _measure_mode_host(
                    jax.jit(make_fe_fn()), st, audios_w, n_short, n_long
                )
                rtf = wide * n_chunks * chunk_sec / per_call
                tflops = rtf * gflops_per_audio_sec / 1e3
                modes["highest_wide"] = {
                    "realtime_factor": round(rtf, 1),
                    "tflops_achieved": round(tflops, 2),
                    "mfu": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
                    "streams": wide,
                }
            except Exception as e:
                print(f"highest_wide extra row failed: {e!r}", file=sys.stderr, flush=True)
    if want_deadend_rows:
        # Deep rider evidence rows: benchmarks/pipeline_ab.py measured them
        # as strict losses (plain 9.6 vs deep 16.5 ms bf16_io) with a
        # FAILING deep-emission bitwise gate on chip.
        # The deep rider path scores through the composite spectra->band
        # conv by construction; run its rows under composite explicitly
        # (the default is materialize since the band A/B) so the evidence
        # rows keep landing regardless of the shipping default.
        prev_composite = os.environ.get("FVAD_BAND_COMPOSITE")
        os.environ["FVAD_BAND_COMPOSITE"] = "on"
        for row, level in (("bf16_deep", "default"), ("highest_deep", "highest")):
            if time.monotonic() >= extra_deadline:
                break
            precision.set_matmul_precision(level)
            precision.set_io_dtype("f32")
            try:
                # FRESH function objects per precision (the trace-cache rule
                # above applies to the deep fns too).
                init_state, prod_fn, deep_fe = make_deep_fns()
                # Bitwise gates (mirrors benchmarks/pipeline_ab.py): (1)
                # the rider's row-sliced segment product == the one-shot
                # product; (2) the deep step's lagged emission == the plain
                # window inputs. Expected bitwise on the MXU (contraction
                # order is row-count independent, at every pass count);
                # XLA:CPU is only ~1-ulp close. The rider reproduces the
                # FUSED basis program, so every reference here pins
                # predecim off (PARITY.md dev. 13) — the plain baseline
                # included, else the gate fails for a spurious
                # program-mismatch reason. Same rule for the GRU: the deep
                # path always runs the fused [400, 1200] projections
                # (defer_head disables split3 in apply()), so the plain
                # baseline must pin split3 off too — at level="default"
                # FVAD_GRU_SPLIT3=auto would otherwise trace split3 and
                # rest the gate on the measured-but-non-contractual
                # split3==fused MXU coincidence (PARITY.md dev. 14).
                offline.set_stft_predecim(False)
                nsnet2.set_gru_split3("off")
                try:
                    plain_fe = jax.jit(make_fe_fn())
                    state0 = init_state()
                    p0 = prod_fn(audios[0])
                    tail = 160 * st.downsample_rate
                    _, _, _, p1, state1 = deep_fe(
                        audios[0], p0, state0, audios[1]
                    )
                    want_p1 = jax.jit(
                        lambda a, t: offline.segmat_prod(
                            a, t, st.downsample_rate, predecim=False
                        )
                    )(audios[1], audios[0][..., -tail:])
                    d_mv, d_rt, d_va = deep_fe(
                        audios[1], p1, state1, audios[2]
                    )[:3]
                    p_mv, p_rt, p_va = plain_fe(audios[0])
                finally:
                    offline.set_stft_predecim(None)
                    nsnet2.set_gru_split3(None)
                gate = bool(
                    jnp.all(p1 == want_p1)
                    & jnp.all(d_mv == p_mv)
                    & jnp.all(d_rt == p_rt)
                    & jnp.all(d_va == p_va)
                )
                per_call = _measure_mode_host_pipe(
                    lambda: (init_state, prod_fn, deep_fe), st, audios,
                    n_short, n_long,
                )
                rtf = audio_sec / per_call
                tflops = rtf * gflops_per_audio_sec / 1e3
                modes[row] = {
                    "realtime_factor": round(rtf, 1),
                    "tflops_achieved": round(tflops, 2),
                    "mfu": round(tflops / V5E_BF16_PEAK_TFLOPS, 4),
                    "gate_bitwise": gate,
                }
            except Exception as e:  # an extra row must never cost the headline
                print(f"{row} extra row failed: {e!r}", file=sys.stderr, flush=True)
        if prev_composite is None:
            os.environ.pop("FVAD_BAND_COMPOSITE", None)
        else:
            os.environ["FVAD_BAND_COMPOSITE"] = prev_composite
    if want_extras:
        emit()  # final line: standard table + whichever extras landed


if __name__ == "__main__":
    main()
