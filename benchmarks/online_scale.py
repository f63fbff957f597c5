"""On-chip online-serving scale curve: tick latency + state footprint vs B.

Round-1 claimed "~2,300 concurrent streams per chip" by extrapolating the
B=64 tick latency (VERDICT round-1 weak #3). This measures the real batched
device step (the OnlineBatchServer's `vmap(chunk_step)`) at
B in {64, 256, 1024, 2304}:

* ms/tick — device time for one lockstep 0.5 s chunk step over all B
  carried VAD states (slope method, distinct resident input buffers; the
  H2D chunk upload is relay-bound in THIS environment and excluded — a
  production host moves ~192 KB/stream/tick over PCIe, see
  parallel/online.py::push notes);
* carry MB — HBM footprint of the B carried states;
* streams/chip — the largest measured B whose tick fits the 500 ms
  real-time budget, plus the latency-derived bound B * 0.5s / tick.

Run on the real chip from the repo root:  python benchmarks/online_scale.py
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
from formula_vad_tpu.pipeline import vad

BS = tuple(int(x) for x in os.environ.get("SCALE_BS", "64,256,1024,2304").split(","))
ITERS = int(os.environ.get("SCALE_ITERS", "10"))
# SCALE_DENOISED=0 measures the events-only serving tier
# (OnlineBatchServer(collect_denoised=False)): the [B, C, chunk] denoised
# batch never materializes as a device output — the high-density regime
# where B=9216 full-tier exhausts HBM.
DENOISED = os.environ.get("SCALE_DENOISED", "1") != "0"
# SCALE_SHARED=0 forces the per-stream framing offset (the pre-round-3
# form); default measures what OnlineBatchServer dispatches in lockstep —
# the shared-fill fast path (one contiguous slice, no per-row gather).
SHARED = os.environ.get("SCALE_SHARED", "1") != "0"
# SCALE_PCM16=1 holds the resident input batches as raw int16 and
# dequantizes on device — exactly the server's PCM16 ingestion path
# (OnlineBatchServer.push with an int16 batch; dequant i/32768 is exact in
# f32). 4x smaller resident inputs. Measured 2026-08-19: even with int16
# inputs, B=18,432 events-only f32 needs 16.70G of 15.75G HBM — past
# ~14k streams the binding term is the step's activations + the dequant
# temp, not the benchmark buffers (FVAD_IO_DTYPE=bf16 halves the former).
PCM16 = os.environ.get("SCALE_PCM16", "0") != "0"
# SCALE_AB=1: at each B, measure pcm16 OFF then ON within this one process
# (the dequant's cost can't be read across processes — relay throttle
# lottery, verify SKILL.md).
AB = os.environ.get("SCALE_AB", "0") != "0"
# SCALE_MICROBATCH=m: split each tick into m sequential shard dispatches of
# B/m streams (OnlineBatchServer(microbatch=m)). Carries stay per-stream
# resident; the step's TRANSIENT activations — the measured HBM binder past
# ~14k streams — shrink by m, trading a few dispatch round trips for
# capacity. Per-row math identical (row-count-independent MXU contractions).
MICRO = int(os.environ.get("SCALE_MICROBATCH", "1"))
# SCALE_INPUT_SETS=1 holds ONE resident input batch instead of the default
# two alternating sets. The double-buffer exists to rule out same-input
# cache/fold artifacts, but the full pipeline step was verified unaffected
# (same-vs-distinct ratio 1.0, verify SKILL.md) — and at B=32k the two
# pcm16 sets alone are ~6 GB of HBM, a BENCHMARK cost production doesn't
# pay (the server uploads per tick, overlapping shard s's compute with
# shard s+1's H2D). Use 1 to probe the true serving HBM ceiling.
INPUT_SETS = int(os.environ.get("SCALE_INPUT_SETS", "2"))
if INPUT_SETS not in (1, 2):
    raise ValueError(f"SCALE_INPUT_SETS must be 1 or 2, got {INPUT_SETS}")
# SCALE_SUSTAIN=n: after the slope measurement, run n additional ticks each
# timed INDIVIDUALLY (every tick ends in a real device sync) and report the
# latency distribution (p50/p95/p99/max + in-budget fraction). The slope
# method measures the steady-state mean; a production serving claim also
# needs the tail. Per-tick sync costs the relay's fixed ~33 ms round trip
# here (verify SKILL.md), so the distribution is CONSERVATIVE — a real
# host's tail sits below it.
SUSTAIN = int(os.environ.get("SCALE_SUSTAIN", "0"))


def _sync(x):
    float(jnp.max(jnp.abs(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32))))


def measure(b: int, params, st, pcm16: bool | None = None) -> dict:
    pcm16 = PCM16 if pcm16 is None else pcm16
    host_fsm = os.environ.get("SCALE_FSM", "host") == "host"
    if host_fsm:
        from formula_vad_tpu.pipeline import fsm_host

        host_fsm = fsm_host.available()

    def batched_step(carries, chunks, valid, start):
        if pcm16:
            # The server's on-device dequant (parallel/online.py::dequant).
            chunks = chunks.astype(jnp.float32) / np.float32(32768.0)
        return jax.vmap(
            lambda c, a, v: vad.chunk_step(
                params, st, c, a, chunk_valid=v, run_fsm=not host_fsm,
                collect_denoised=DENOISED,
                shared_start=start if SHARED else None,
            )
        )(carries, chunks, valid)

    jstep = jax.jit(batched_step)
    fill = {"v": 0}  # lockstep fill phase, host-tracked like the server's
    m = MICRO
    if b % m:
        raise ValueError(f"B={b} must be a multiple of SCALE_MICROBATCH={m}")
    sh = b // m

    def step(carries, chunks_m, valid):
        # One tick = m sequential shard dispatches (the server's
        # microbatch loop, parallel/online.py::_run_step).
        start = jnp.int32(st.fft_size - fill["v"])
        new_c, outs = [], []
        for s in range(m):
            c2, o = jstep(carries[s], chunks_m[s], valid, start)
            new_c.append(c2)
            outs.append(o)
        fill["v"] = (fill["v"] + st.chunk_size) % st.fft_size
        return new_c, outs

    carries = [
        jax.vmap(lambda _: vad.init_carry(st))(jnp.arange(sh)) for _ in range(m)
    ]
    carry_bytes = m * sum(
        x.nbytes for x in jax.tree_util.tree_leaves(carries[0])
    )

    # Inputs are generated ON DEVICE (only the PRNG key crosses the tunnel):
    # incompressible f32 noise moves at ~10-25 MB/s through the relay, which
    # at B=13,824 cost minutes per resident buffer.
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
        for i in range(INPUT_SETS)
    ]
    input_bytes = sum(int(c.nbytes) for row in chunks for c in row)
    valid = jnp.ones((sh,), bool)

    carries, outs = step(carries, chunks[0], valid)
    _sync(outs[-1])
    fill0 = fill["v"]  # run() restarts from the post-warmup carries

    def run(n):
        c = carries
        fill["v"] = fill0
        t0 = time.perf_counter()
        for i in range(n):
            c, outs = step(c, chunks[i % INPUT_SETS], valid)
        for o in outs:
            _sync(o)
        return time.perf_counter() - t0

    if ITERS < 2:  # degenerate: no slope possible, fall back to the average
        tick = run(1)
    else:
        short = min(ITERS - 1, max(2, ITERS // 4))  # keep ITERS-short > 0
        tick = (run(ITERS) - run(short)) / (ITERS - short)

    sustain = {}
    if SUSTAIN > 0:
        lat = np.empty(SUSTAIN)
        c = carries
        fill["v"] = fill0
        for i in range(SUSTAIN):
            t0 = time.perf_counter()
            c, outs_i = step(c, chunks[i % INPUT_SETS], valid)
            # One sync per tick: device programs execute in enqueue order,
            # so the LAST shard's output completing implies the whole tick
            # did — m syncs would add m fixed ~33 ms relay round trips.
            _sync(outs_i[-1])
            lat[i] = time.perf_counter() - t0
        sustain = {"n": SUSTAIN, "lat_ms": np.sort(lat) * 1e3}

    decode_ms = 0.0
    if host_fsm:
        # The per-tick host decode sits on the serving thread between device
        # steps — additive (conservative: it could pipeline with the next
        # tick). Inputs are the per-tick outputs the server fetches anyway.
        from formula_vad_tpu.pipeline import fsm_host

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
        tick = tick + decode_ms / 1e3

    if sustain:
        # Fold the per-tick host decode in EVERYWHERE (additive constant —
        # percentiles shift exactly), so the distribution and the
        # in-budget fraction use the same semantics as the headline
        # ms_per_tick/fits_budget. Each sustained tick also carries the
        # relay's fixed per-sync round trip (~33 ms here) that the slope
        # method cancels — the tail is conservative on this host.
        lat_ms = sustain.pop("lat_ms") + decode_ms
        sustain.update(
            p50_ms=float(np.percentile(lat_ms, 50)),
            p95_ms=float(np.percentile(lat_ms, 95)),
            p99_ms=float(np.percentile(lat_ms, 99)),
            max_ms=float(lat_ms[-1]),
            in_budget_frac=float((lat_ms < 500.0).mean()),
        )
        print(
            f"   sustain n={sustain['n']} (decode-inclusive, "
            f"+{decode_ms:.1f} ms each): "
            f"p50 {sustain['p50_ms']:.1f}  p95 {sustain['p95_ms']:.1f}  "
            f"p99 {sustain['p99_ms']:.1f}  max {sustain['max_ms']:.1f} ms  "
            f"in-budget {sustain['in_budget_frac'] * 100:.1f}%"
        )
    return {
        "b": b,
        "ms_per_tick": tick * 1e3,
        "decode_ms": decode_ms,
        "carry_mb": carry_bytes / 2**20,
        "input_mb": input_bytes / 2**20,
        "audio_sec_per_sec": b * (st.chunk_size / st.sample_rate) / tick,
        "fits_budget": tick < 0.5,
        **({"sustain": sustain} if sustain else {}),
    }


def main():
    params = nsnet2.load(None)
    st = vad.statics_from_config(VADConfig())
    rows = []
    print(
        f"denoised={int(DENOISED)} shared={int(SHARED)} pcm16={int(PCM16)} "
        f"fsm={os.environ.get('SCALE_FSM', 'host')} microbatch={MICRO}"
    )
    print(
        f"{'B':>6} {'ms/tick':>9} {'carry MB':>9} {'input MB':>9} "
        f"{'audio-s/s':>10} {'<500ms':>7}"
    )
    variants = [(None, "")] if not AB else [(False, " f32"), (True, " pcm16")]
    oomed = set()  # variants that hit the ceiling (a larger B only OOMs again)
    for b in BS:
        if len(oomed) == len(variants):
            break
        for pcm16, tag in variants:
            if (pcm16, tag) in oomed:
                continue
            try:
                r = measure(b, params, st, pcm16)
            except Exception as e:
                # Runtime OOM (RESOURCE_EXHAUSTED) or compile-time OOM
                # (INTERNAL "Ran out of memory in memory space hbm" through
                # the relay's remote-compile helper): record THIS variant's
                # ceiling and keep sweeping the others (in AB mode the
                # pcm16 variant holds 4x smaller inputs and may still fit).
                msg = str(e)
                if (
                    "RESOURCE_EXHAUSTED" in msg
                    or "ResourceExhausted" in msg
                    or "Ran out of memory" in msg
                    or "out of memory" in msg.lower()
                ):
                    print(f"{b:>6}{tag}  HBM ceiling ({msg.splitlines()[0][:120]})")
                    oomed.add((pcm16, tag))
                    continue
                raise
            r["variant"] = tag.strip() or ("pcm16" if PCM16 else "f32")
            rows.append(r)
            print(
                f"{r['b']:>6}{tag} {r['ms_per_tick']:>9.1f} {r['carry_mb']:>9.1f} "
                f"{r['input_mb']:>9.1f} "
                f"{r['audio_sec_per_sec']:>10.0f} {str(r['fits_budget']):>7}"
            )
    ok = [r for r in rows if r["fits_budget"]]
    if ok:
        # Prefer the faster tick on B ties so AB mode attributes the record
        # to the variant that actually set it.
        best = max(ok, key=lambda r: (r["b"], -r["ms_per_tick"]))
        print(
            f"\nlargest measured B inside the 0.5 s tick budget: {best['b']} "
            f"[{best['variant']}] "
            f"({best['ms_per_tick']:.1f} ms/tick; latency-derived ceiling "
            f"~{int(best['b'] * 500 / best['ms_per_tick'])} streams)"
        )


if __name__ == "__main__":
    main()
