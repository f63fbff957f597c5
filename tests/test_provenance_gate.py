"""scripts/provenance_gate.py — the evidence-provenance gate that keeps
README performance claims honest against the driver artifacts (VERDICT
round-3 next-#5: a 2x claim-vs-record gap sat unremarked for a round)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "provenance_gate", os.path.join(REPO, "scripts", "provenance_gate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


pg = _load()


def test_real_readme_passes():
    assert pg.check(os.path.join(REPO, "README.md")) == []


def test_real_roofline_passes():
    assert pg.check_roofline(os.path.join(REPO, "ROOFLINE.md")) == []


def test_driver_records_load():
    recs = pg.load_driver_records()
    assert "BENCH_r03" in recs
    assert recs["BENCH_r03"]["bf16"] == 36051.3
    # r02 was the outage capture (parsed: null) — tolerated, not a record.
    assert "BENCH_r02" not in recs or recs["BENCH_r02"]


def _readme(tmp_path, table_rows, extra=""):
    p = tmp_path / "README.md"
    p.write_text(
        "# x\n\n<!-- PERF_TABLE_START -->\n"
        "| tier | real-time factor | evidence |\n|---|---|---|\n"
        + "".join(r + "\n" for r in table_rows)
        + "<!-- PERF_TABLE_END -->\n" + extra
    )
    return str(p)


GOOD_ROWS = [
    "| `highest` | 14,108× | [driver BENCH_r04] |",
    "| `high` | 21,712× | [driver BENCH_r04] |",
    "| `bf16` | 35,058× | [driver BENCH_r04] |",
    "| `bf16_io` | 44,246× | [local 2026-08-20] |",
]


def test_synthetic_pass(tmp_path):
    assert pg.check(_readme(tmp_path, GOOD_ROWS)) == []


def test_untagged_row_fails(tmp_path):
    rows = GOOD_ROWS[:3] + ["| `bf16_io` | 44,246× | builder capture |"]
    errs = pg.check(_readme(tmp_path, rows))
    assert any("lacks a provenance tag" in e for e in errs)


def test_driver_tag_value_mismatch_fails(tmp_path):
    rows = GOOD_ROWS[:3] + ["| `bf16_io` | 44,246× | [driver BENCH_r03] |"]
    errs = pg.check(_readme(tmp_path, rows))
    assert any(">2% off" in e for e in errs)


def test_untagged_inflated_claim_outside_table_fails(tmp_path):
    errs = pg.check(_readme(
        tmp_path, GOOD_ROWS, extra="\nwe now reach ~50,000× real-time!\n"))
    assert any("exceeds the best driver-captured value" in e for e in errs)
    # The same claim WITH a tag is allowed.
    assert pg.check(_readme(
        tmp_path, GOOD_ROWS,
        extra="\nwe now reach ~50,000× real-time [local 2026-08-20]\n")) == []


def test_k_suffixed_and_spaced_claims_are_caught(tmp_path):
    """The round-3 failure written as '~44.3k×' or '50 000×' must not
    evade the gate (review finding: the first regex only matched plain
    digit runs)."""
    for claim in ("~44.3k× real-time", "50k× faster", "50 000× real-time"):
        errs = pg.check(_readme(tmp_path, GOOD_ROWS, extra=f"\nnow {claim}!\n"))
        assert any("exceeds the best driver-captured" in e for e in errs), claim
    # ...and unrelated digit runs never join into a phantom claim.
    assert pg.check(_readme(
        tmp_path, GOOD_ROWS, extra="\nin 2026 8x mode shipped\n")) == []


def test_missing_markers_fail(tmp_path):
    p = tmp_path / "README.md"
    p.write_text("# x\nno table here\n")
    errs = pg.check(str(p))
    assert errs and "markers" in errs[0]


def test_stale_driver_tag_in_table_fails(tmp_path):
    """Rule 4 (VERDICT r4 next-#6): a perf-table tag >=2 rounds older than
    the newest artifact must be refreshed or marked (superseded)."""
    rows = GOOD_ROWS[:3] + ["| `bf16_io` | 22,977× | [driver BENCH_r01] |"]
    errs = pg.check(_readme(tmp_path, rows))
    assert any("rounds older" in e for e in errs), errs
    # The same tag marked (superseded) is allowed...
    rows_ok = GOOD_ROWS[:3] + [
        "| `bf16_io` | 22,977× | [driver BENCH_r01] (superseded) |"
    ]
    errs_ok = [e for e in pg.check(_readme(tmp_path, rows_ok))
               if "rounds older" in e]
    assert errs_ok == []
    # ...and a 1-round-old tag is not stale (BENCH_r04 rows vs newest r04+).


def test_roofline_staleness_and_ceiling(tmp_path):
    """ROOFLINE's MFU-summary section is a summary surface: stale driver
    tags fail there but are tolerated in narrative sections below; the
    rule-3 ceiling scan covers the whole file."""
    p = tmp_path / "ROOFLINE.md"
    p.write_text(
        "# roofline\n\n## MFU summary (bench)\n\n"
        "| bf16 | 19,900× [driver BENCH_r01] |\n\n"
        "## History\n\nround 1 was 19,900× [driver BENCH_r01].\n"
        "untagged 90,000× here.\n"
    )
    errs = pg.check_roofline(str(p))
    stale = [e for e in errs if "rounds older" in e]
    assert len(stale) == 1 and ":5:" in stale[0]  # summary row only
    assert any("exceeds the best driver-captured" in e for e in errs)
    # Marked (superseded), the summary row passes.
    p.write_text(
        "# roofline\n\n## MFU summary (bench)\n\n"
        "| bf16 | 19,900× [driver BENCH_r01] (superseded) |\n"
    )
    assert [e for e in pg.check_roofline(str(p)) if "rounds older" in e] == []


def test_roofline_missing_summary_section(tmp_path):
    p = tmp_path / "ROOFLINE.md"
    p.write_text("# roofline\nnothing\n")
    errs = pg.check_roofline(str(p))
    assert any("MFU summary" in e for e in errs)
