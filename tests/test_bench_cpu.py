"""bench.py harness coverage (CPU backend, tiny shapes).

bench.py is the artifact the driver records as BENCH_r{N}.json — a silent
regression there costs a round's official number (it already happened once:
BENCH_r02 was an rc-124 hang during a relay outage). These tests pin:

* the measure() child emits the full JSON contract — headline + the
  standard precision modes table + the round-3 self-gated extra rows
  (``bf16_deep`` with its PARITY.md-deviation-12 bitwise-gate flag,
  ``bf16_wide`` with its stream width),
* the preflight fails FAST and STRUCTURED when the relay is down
  (VERDICT round-2 weak #1): no hang, one parseable
  ``{"error": "relay_down"}`` line, exit code 2.
"""

import importlib
import io
import json
import os
import subprocess
import sys
from contextlib import redirect_stdout

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as bench_mod

    return importlib.reload(bench_mod)


def test_throttle_kept_rounds(bench):
    """The per-round sentinel filter (VERDICT r4 next-#1b): a round is
    kept iff both bracketing samples sit within tol of the best sample."""
    kept = bench._throttle_kept_rounds
    # Clean capture: everything kept.
    assert kept([4.0, 4.1, 4.0, 4.05], 3, 1.10) == [0, 1, 2]
    # Throttle hits between brackets 1 and 2: rounds 1 AND 2 (both adjacent
    # to the inflated sample) are dropped — exactly the BENCH_r04 failure
    # mode the block-level bracket missed.
    assert kept([4.0, 4.1, 9.0, 4.05], 3, 1.10) == [0]
    # Throttled from the start: only the post-recovery round survives.
    assert kept([9.0, 8.5, 4.0, 4.1], 3, 1.10) == [2]
    # Persistent throttle with one lucky sample: nothing survives — the
    # caller publishes raw stats with reps_kept=0 rather than a fiction.
    assert kept([9.0, 4.0, 9.0, 9.1], 3, 1.10) == []
    # Misaligned / missing series: filtering disabled, all rounds kept.
    assert kept([], 3, 1.10) == [0, 1, 2]
    assert kept([4.0, 4.0], 3, 1.10) == [0, 1, 2]


def test_walk_dense_ladder_brackets_ceiling(bench):
    """VERDICT r4 next-#4: the serve_dense ladder must publish the largest
    in-budget rung AND the adjacent measured capacity failure."""
    def mk(b, m, tick, fits):
        return {"streams": b, "microbatch": m, "tick_ms": tick,
                "fits_500ms_budget": fits}

    # Over-budget rung above, pass below: bracket = (pass, that fail).
    def meas(b, m):
        if b >= 36000:
            return mk(b, m, 620.0, False)
        return mk(b, m, 380.0, True)

    row, fail, att = bench._walk_dense_ladder(
        [(43008, 4), (36864, 3), (27648, 3)], meas, lambda: False)
    assert row["streams"] == 27648 and row["fits_500ms_budget"]
    assert fail == {"streams": 36864, "microbatch": 3,
                    "tick_ms": 620.0, "over_budget": True}
    assert [a["streams"] for a in att] == [43008, 36864]

    # OOM above, pass below: the OOM rung is the capacity failure.
    def meas_oom(b, m):
        if b > 30000:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory")
        return mk(b, m, 400.0, True)

    row, fail, att = bench._walk_dense_ladder(
        [(36864, 3), (27648, 3)], meas_oom, lambda: False)
    assert row["streams"] == 27648
    assert fail["streams"] == 36864 and "RESOURCE_EXHAUSTED" in fail["error"]

    # Config errors (not OOM) never bracket.
    def meas_cfg(b, m):
        if b % m:
            raise ValueError(f"{b} streams not divisible by microbatch {m}")
        return mk(b, m, 400.0, True)

    row, fail, att = bench._walk_dense_ladder(
        [(9, 2), (8, 2)], meas_cfg, lambda: False)
    assert row["streams"] == 8 and fail is None
    assert "error" in att[0]

    # Nothing fits: smallest measured rung published over budget, and it
    # IS the failure (caller suppresses a self-referential first_fail).
    def meas_slow(b, m):
        return mk(b, m, 900.0, False)

    row, fail, att = bench._walk_dense_ladder(
        [(16, 1), (8, 1)], meas_slow, lambda: False)
    assert row["streams"] == 8 and not row["fits_500ms_budget"]
    assert fail["streams"] == 8 and fail["over_budget"]

    # Past-deadline: middle rungs skipped, final always attempted.
    row, fail, att = bench._walk_dense_ladder(
        [(32, 1), (16, 1), (8, 1)], meas_cfg, lambda: True)
    assert row["streams"] == 32  # first rung measured before deadline check
    # (attempts empty -> no skip on rung 0; break on its in-budget pass)

    # Anchor: past the deadline, rungs above the anchor are skipped but
    # the anchor rung is still attempted — a degraded capture falls back
    # to the proven record rung, not the smallest one.
    calls = []

    def meas_anchor(b, m):
        calls.append(b)
        if b > 40:
            raise ValueError("fail high rung")
        return mk(b, m, 400.0, True)

    row, fail, att = bench._walk_dense_ladder(
        [(64, 1), (48, 1), (32, 1), (8, 1)], meas_anchor,
        lambda: True, anchor=32)
    assert calls == [64, 32]  # 48 deadline-skipped, anchor attempted
    assert row["streams"] == 32
    assert att[1] == {"streams": 48, "microbatch": 1, "skipped": "deadline"}


def test_measure_json_contract(bench, monkeypatch, capsys):
    """One in-process child run at tiny shapes: every mode row present,
    extras included, headline positive and derived from mode 'highest'."""
    for k, v in {
        "BENCH_STREAMS": "2",
        "BENCH_CHUNKS": "2",
        "BENCH_ITERS_SHORT": "1",
        "BENCH_ITERS_LONG": "2",
        "BENCH_REPS": "2",
        "BENCH_REPS_MAX": "3",
        "BENCH_WIDE_STREAMS": "4",
        "BENCH_SERVE_STREAMS": "8",
        "BENCH_SERVE_DENSE_STREAMS": "8",
        "BENCH_SENTINEL_DIM": "64",
        "BENCH_SENTINEL_DEPTH": "2",
        "FVAD_BENCH_CPU": "1",
        # Dead-end evidence rows (flat/deep) are off by default since the
        # 2026-08-19 pipeline_ab verdicts; keep exercising them here.
        "BENCH_DEADEND_ROWS": "1",
    }.items():
        monkeypatch.setenv(k, v)
    monkeypatch.delenv("BENCH_MODES", raising=False)
    monkeypatch.delenv("FVAD_BENCH_PIPELINE", raising=False)

    from formula_vad_tpu.ops import precision

    try:
        bench.measure()
    finally:
        # measure() mutates the global precision policy per mode row.
        precision.set_matmul_precision("highest")
        precision.set_io_dtype("f32")
    out = capsys.readouterr().out.strip().splitlines()
    got = json.loads(out[-1])

    assert got["metric"] == "realtime_factor"
    assert got["unit"] == "audio_sec/sec/chip"
    assert got["value"] and got["value"] > 0
    # vs_baseline is rounded to 3 decimals in the JSON line.
    assert got["vs_baseline"] == pytest.approx(got["value"] / 5000.0, abs=5.1e-4)
    modes = got["modes"]
    for name in (
        "highest", "bf16", "bf16_io", "high", "bf16_flat", "bf16_io_flat",
        "bf16_deep", "highest_deep", "highest_wide",
    ):
        assert name in modes, f"missing mode row {name}"
        assert modes[name]["realtime_factor"] > 0
        # tflops rounds to 2 decimals; at the tiny CPU shapes a slow row
        # can legitimately round to 0.0 — non-negative is the contract.
        assert modes[name]["tflops_achieved"] >= 0
    # Round-5 variance contract: the interleaved standard tiers publish the
    # median with min/max spread over BENCH_REPS..BENCH_REPS_MAX rounds
    # (adaptive escalation under spread/throttle) plus the count of rounds
    # the per-round sentinel filter kept.
    for name in ("highest", "bf16", "bf16_io", "high"):
        row = modes[name]
        assert 2 <= row["reps"] <= 3
        assert 0 < row["rtf_min"] <= row["realtime_factor"] <= row["rtf_max"]
        assert 0 <= row["reps_kept"] <= row["reps"]
        if "rtf_median_raw" in row:  # filtered headline: raw kept alongside
            assert row["rtf_min"] <= row["rtf_median_raw"] <= row["rtf_max"]
    # Sentinel probe: fixed-work capture-environment evidence, one sample
    # bracketing every rep round (series length = rounds + 1).
    sent = got["sentinel"]
    assert sent["start_ms"] > 0 and sent["end_ms"] > 0
    assert sent["ratio"] == pytest.approx(
        sent["end_ms"] / sent["start_ms"], rel=0.01
    )
    n_rounds = modes["highest"]["reps"]
    assert sent["rounds_total"] == n_rounds
    assert len(sent["samples_ms"]) == n_rounds + 1
    assert sent["samples_ms"][0] == sent["start_ms"]
    assert sent["samples_ms"][-1] == sent["end_ms"]
    assert sent["best_ms"] == min(sent["samples_ms"])
    assert sent["spread"] >= 1.0
    assert sent["rounds_kept"] == modes["highest"]["reps_kept"]
    # Flat-overlap gates: at f32-highest the flat path is exactly equal on
    # CPU too (tests/test_flat_overlap.py), but these rows run at bf16
    # matmul precision, where XLA:CPU's bf16 lowering differs per program
    # context — so on CPU the contract is that the gate RAN and recorded a
    # verdict (the MXU's dot is context-independent; chip expected True).
    assert isinstance(modes["bf16_flat"]["gate_bitwise"], bool)
    assert isinstance(modes["bf16_io_flat"]["gate_bitwise"], bool)
    assert got["value"] == modes["highest"]["realtime_factor"]
    # The bitwise gate is an MXU property (PARITY.md deviation 12); on
    # XLA:CPU the result is backend-dependent (typically ~1-ulp off). The
    # contract here is that the gate RAN and recorded a verdict.
    assert isinstance(modes["bf16_deep"]["gate_bitwise"], bool)
    assert isinstance(modes["highest_deep"]["gate_bitwise"], bool)
    assert modes["highest_wide"]["streams"] == 4
    # Serving tick row (the driver-visible serving-scale record) — since
    # round 4 with the same rep/median+spread discipline as the tiers.
    assert modes["serve"]["streams"] == 8
    assert modes["serve"]["tick_ms"] > 0
    assert (0 < modes["serve"]["tick_ms_min"]
            <= modes["serve"]["tick_ms_max"])
    assert modes["serve"]["reps"] >= 1
    assert modes["serve"]["events_only"] is False
    assert isinstance(modes["serve"]["fits_500ms_budget"], bool)
    assert modes["serve"]["streams_per_chip_est"] > 0
    assert modes["serve_dense"]["streams"] == 8
    assert modes["serve_dense"]["events_only"] is True
    assert modes["serve_dense"]["io_dtype"] == "bf16"
    assert modes["serve_dense"]["tick_ms"] > 0
    # The dense tier runs the server's production ingestion form.
    assert modes["serve_dense"]["pcm16"] is True
    assert modes["serve_dense"]["microbatch"] == 1
    assert modes["serve"]["pcm16"] is False


def test_measure_default_extras_gating(bench, monkeypatch, capsys):
    """Without BENCH_DEADEND_ROWS the capture spends its window only on the
    live rows: high/serve/wide present, flat/deep absent."""
    for k, v in {
        "BENCH_STREAMS": "2",
        "BENCH_CHUNKS": "2",
        "BENCH_ITERS_SHORT": "1",
        "BENCH_ITERS_LONG": "2",
        "BENCH_REPS": "1",
        "BENCH_WIDE_STREAMS": "4",
        "BENCH_SERVE_STREAMS": "8",
        # Ladder exercise: the first rung (9 streams, microbatch 2) is
        # invalid (9 % 2 != 0) and must fall back gracefully to the 8:2
        # rung — which also exercises the microbatched (m>1) tick
        # measurement path on CPU — recording the failed rung in the row.
        "BENCH_SERVE_DENSE_LADDER": "9:2,8:2",
        "BENCH_SENTINEL_DIM": "64",
        "BENCH_SENTINEL_DEPTH": "2",
        "FVAD_BENCH_CPU": "1",
    }.items():
        monkeypatch.setenv(k, v)
    for k in ("BENCH_MODES", "FVAD_BENCH_PIPELINE", "BENCH_DEADEND_ROWS",
              "BENCH_SERVE_DENSE_STREAMS"):
        monkeypatch.delenv(k, raising=False)

    from formula_vad_tpu.ops import precision

    try:
        bench.measure()
    finally:
        precision.set_matmul_precision("highest")
        precision.set_io_dtype("f32")
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    modes = got["modes"]
    for name in ("highest", "bf16", "bf16_io", "high", "highest_wide",
                 "serve", "serve_dense"):
        assert name in modes, f"missing live mode row {name}"
    for name in ("bf16_flat", "bf16_io_flat", "bf16_deep", "highest_deep"):
        assert name not in modes, f"dead-end row {name} ran without opt-in"
    # Ladder fallback landed on the valid rung and recorded the failed one;
    # the published rung ran the m=2 microbatched tick.
    sd = modes["serve_dense"]
    assert sd["streams"] == 8 and sd["microbatch"] == 2
    assert sd["fallback_from"][0]["streams"] == 9
    assert "error" in sd["fallback_from"][0]


def test_measure_gate_sanity_contract(bench, monkeypatch, capsys):
    """chip_gate.sh's sanity stage (BENCH_MODES=highest, extras deadline 0)
    must yield exactly the headline row and NO other mode/extra rows — the
    contract that keeps the gate's bench inside its stage budget even with
    cold compile caches (round-3d FAIL postmortem)."""
    for k, v in {
        "BENCH_STREAMS": "2",
        "BENCH_CHUNKS": "2",
        "BENCH_ITERS_SHORT": "1",
        "BENCH_ITERS_LONG": "2",
        "FVAD_BENCH_CPU": "1",
        "BENCH_MODES": "highest",
        "BENCH_EXTRA_DEADLINE": "0",
    }.items():
        monkeypatch.setenv(k, v)
    for k in ("FVAD_BENCH_PIPELINE", "BENCH_DEADEND_ROWS"):
        monkeypatch.delenv(k, raising=False)

    from formula_vad_tpu.ops import precision

    try:
        bench.measure()
    finally:
        precision.set_matmul_precision("highest")
        precision.set_io_dtype("f32")
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["value"] == got["modes"]["highest"]["realtime_factor"] > 0
    assert set(got["modes"]) == {"highest"}
    # Tier-subset runs stay lean: no sentinel compile unless opted in.
    assert "sentinel" not in got


def test_preflight_relay_down_fails_fast(bench, monkeypatch):
    """Dead relay port + hung backend probe => structured error, exit 2."""
    monkeypatch.setattr(bench, "RELAY_ADDR", "127.0.0.1:1")
    monkeypatch.setenv("BENCH_RELAY_WAIT_SEC", "0.1")
    monkeypatch.delenv("FVAD_BENCH_SKIP_PROBE", raising=False)

    def hang(*a, **kw):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=kw.get("timeout", 20))

    monkeypatch.setattr(bench.subprocess, "run", hang)
    buf = io.StringIO()
    with pytest.raises(SystemExit) as exc, redirect_stdout(buf):
        bench._preflight()
    assert exc.value.code == 2
    got = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert got == {
        "metric": "realtime_factor",
        "value": None,
        "error": "relay_down",
        "detail": got["detail"],
    }
    assert "relay-down signature" in got["detail"]


def test_relay_probe_rejects_hung_http(bench):
    """The 2026-08-20 outage mode: TCP accepts, HTTP never answers — the
    probe must return False (and fast) instead of passing on connect."""
    import socket as socket_mod
    import threading

    srv = socket_mod.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    conns = []

    def accept_and_stall():
        try:
            conns.append(srv.accept()[0])  # accept, never respond
        except OSError:
            pass

    t = threading.Thread(target=accept_and_stall, daemon=True)
    t.start()
    old = bench.RELAY_ADDR
    bench.RELAY_ADDR = f"127.0.0.1:{port}"
    try:
        assert bench._relay_reachable(timeout=0.5) is False
    finally:
        bench.RELAY_ADDR = old
        for c in conns:
            c.close()
        srv.close()


def test_relay_probe_accepts_responding_http(bench):
    """Any HTTP response (even 404) means the relay is up."""
    import socket as socket_mod
    import threading

    srv = socket_mod.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def accept_and_404():
        try:
            c = srv.accept()[0]
            c.recv(256)
            c.sendall(b"HTTP/1.0 404 Not Found\r\ncontent-length: 0\r\n\r\n")
            c.close()
        except OSError:
            pass

    t = threading.Thread(target=accept_and_404, daemon=True)
    t.start()
    old = bench.RELAY_ADDR
    bench.RELAY_ADDR = f"127.0.0.1:{port}"
    try:
        assert bench._relay_reachable(timeout=2.0) is True
    finally:
        bench.RELAY_ADDR = old
        srv.close()


def test_parent_salvages_timed_out_child(bench, monkeypatch, capsys):
    """A child killed mid-extras still contributes its early-emitted
    standard table: the parent parses the partial stdout attached to
    TimeoutExpired instead of discarding the attempt."""
    table = json.dumps(
        {
            "metric": "realtime_factor",
            "value": 123.0,
            "unit": "audio_sec/sec/chip",
            "vs_baseline": 0.025,
            "tflops_achieved": 1.0,
            "mfu": 0.01,
            "fsm": "host",
            "pipelined": False,
            "modes": {"highest": {"realtime_factor": 123.0}},
        }
    )

    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(
            cmd=a[0], timeout=kw.get("timeout", 1),
            output="bf16_deep extra row running...\n" + table + "\n",
        )

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setenv("FVAD_BENCH_SKIP_PROBE", "1")
    monkeypatch.delenv("FVAD_BENCH_CHILD", raising=False)
    bench.main()
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["value"] == 123.0


def test_preflight_skip_env(bench, monkeypatch):
    monkeypatch.setenv("FVAD_BENCH_SKIP_PROBE", "1")
    bench._preflight()  # must not raise or probe anything
