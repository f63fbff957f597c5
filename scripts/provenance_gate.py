#!/usr/bin/env python3
"""Evidence-provenance gate for performance claims (VERDICT r3 next-#5).

Round 3's flagship claim (bf16_io ~44.3k x) sat in README for a full round
while the official driver record (BENCH_r03) said 22,977x — nothing
distinguished driver-verified numbers from builder-local ones. This gate
makes the distinction machine-checked:

1. The README performance table (between the PERF_TABLE_START/END marker
   comments) must tag EVERY row's evidence as either
   ``[driver BENCH_rNN]`` or ``[local YYYY-MM-DD]``.
2. A ``[driver BENCH_rNN]`` row's realtime factor must match that
   artifact's recorded value for the row's tier within 2%.
3. Any OTHER real-time-factor claim in README or ROOFLINE.md (a number
   suffixed with x / ×) that exceeds the best driver-captured realtime
   factor by >15% must carry a ``[driver ...]`` or ``[local ...]`` tag on
   its line — untagged claims may never outrun the official record.
4. Staleness (VERDICT r4 next-#6): a ``[driver BENCH_rNN]`` tag in
   README's perf table or ROOFLINE's "MFU summary" section that
   references a round >= 2 older than the newest committed artifact must
   say ``(superseded)`` on the same line — superseded numbers may not
   masquerade as the current record in the summary surfaces. (Tags in
   historical/narrative sections elsewhere are exempt: they document the
   progression.)

Exit 0 = clean; exit 1 = violations (printed). Run by scripts/check.sh.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TIER_KEYS = ("highest", "high", "bf16", "bf16_io")
# Claims: a number directly suffixed (possibly via a space) by x/×, in any
# of the forms used for real-time factors — grouped thousands ("13,725" /
# "13 725", strict 3-digit groups so unrelated digit runs never join),
# plain/decimal ("44246", "2.75"), or k-suffixed ("44.3k", "50k").
NUM_X = re.compile(
    r"(?<![\w.])"                  # left boundary: not inside an identifier
                                   # ("bf16_3x" is a tier name, not a claim)
    r"(\d{1,3}(?:[,\s  ]\d{3})+"  # grouped thousands (comma/space/nbsp)
    r"|\d+(?:\.\d+)?)"             # or plain / decimal
    r"\s*(k?)\s*(?:x\b|×)",       # optional k multiplier, then x/×
    re.IGNORECASE,
)
TAG = re.compile(r"\[(driver BENCH_r\d+|local[^\]]*)\]")


def load_driver_records() -> dict[str, dict[str, float]]:
    """Per-artifact tier realtime factors from BENCH_r*.json."""
    out: dict[str, dict[str, float]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        name = os.path.splitext(os.path.basename(path))[0]
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = rec.get("parsed") or rec  # BENCH_r02 (outage): parsed=null
        modes = parsed.get("modes") or {}
        tiers = {
            t: float(m["realtime_factor"])
            for t, m in modes.items()
            if isinstance(m, dict) and "realtime_factor" in m
        }
        if not tiers and parsed.get("value"):
            tiers = {"highest": float(parsed["value"])}
        if tiers:
            out[name] = tiers
    return out


def parse_num(m) -> float:
    """(number, k-flag) match tuple -> value (k multiplies by 1000)."""
    num, k = m
    return float(re.sub(r"[,   ]", "", num)) * (1000.0 if k else 1.0)


def check(readme_path: str) -> list[str]:
    errors: list[str] = []
    records = load_driver_records()
    if not records:
        return ["no BENCH_r*.json driver artifacts found"]
    best_driver = max(v for tiers in records.values() for v in tiers.values())
    ceiling = 1.15 * best_driver

    with open(readme_path) as f:
        lines = f.read().splitlines()

    # --- the marked performance table ---
    try:
        start = next(i for i, l in enumerate(lines) if "PERF_TABLE_START" in l)
        end = next(i for i, l in enumerate(lines) if "PERF_TABLE_END" in l)
    except StopIteration:
        return ["README is missing the PERF_TABLE_START/END markers"]
    table_rows = [
        (i, l) for i, l in enumerate(lines[start:end], start)
        if l.strip().startswith("|") and not set(l) <= set("|-: ")
        and "real-time factor" not in l
    ]
    if len(table_rows) < len(TIER_KEYS):
        errors.append(
            f"perf table has {len(table_rows)} data rows, expected >= {len(TIER_KEYS)}"
        )
    for i, row in table_rows:
        m = TAG.search(row)
        if not m:
            errors.append(f"README:{i + 1}: perf-table row lacks a provenance tag: {row.strip()}")
            continue
        nums = NUM_X.findall(row)
        if not nums:
            errors.append(f"README:{i + 1}: perf-table row has no 'x' claim: {row.strip()}")
            continue
        claim = parse_num(nums[0])
        tier = next((t for t in sorted(TIER_KEYS, key=len, reverse=True)
                     if re.search(rf"\b{re.escape(t)}\b", row)), None)
        if tier is None:
            errors.append(f"README:{i + 1}: perf-table row names no known tier: {row.strip()}")
            continue
        tag = m.group(1)
        if tag.startswith("driver "):
            art = tag.split(" ", 1)[1]
            rec = records.get(art)
            if rec is None:
                errors.append(f"README:{i + 1}: tag references missing artifact {art}")
            elif tier not in rec:
                errors.append(f"README:{i + 1}: {art} has no `{tier}` row")
            elif abs(claim - rec[tier]) > 0.02 * rec[tier]:
                errors.append(
                    f"README:{i + 1}: `{tier}` claims {claim:.0f}x but {art} "
                    f"recorded {rec[tier]:.0f}x (>2% off)"
                )
        # [local ...] rows: the tag IS the disclosure; no value check.

    # --- untagged claims elsewhere in the README ---
    errors += check_untagged_ceiling(
        "README", lines, best_driver, ceiling, skip=range(start, end)
    )
    # --- staleness in the perf table ---
    errors += check_staleness("README", lines, records, only=range(start, end))
    return errors


def check_untagged_ceiling(name, lines, best_driver, ceiling, skip=()):
    """Rule 3: untagged x-claims above the driver ceiling."""
    errors = []
    for i, line in enumerate(lines):
        if i in skip or TAG.search(line):
            continue
        for s in NUM_X.findall(line):
            n = parse_num(s)
            if n > ceiling:
                errors.append(
                    f"{name}:{i + 1}: untagged claim {s[0].strip()}{s[1]}x exceeds the best "
                    f"driver-captured value ({best_driver:.0f}x) by >15% — tag it "
                    f"[driver BENCH_rNN] or [local YYYY-MM-DD]: {line.strip()[:90]}"
                )
    return errors


DRIVER_TAG = re.compile(r"\[driver (BENCH_r(\d+))\]")


def check_staleness(name, lines, records, only):
    """Rule 4: driver tags in a summary surface must be current (within 1
    round of the newest committed artifact) or marked (superseded)."""
    rounds = [int(re.search(r"r(\d+)", a).group(1)) for a in records]
    newest = max(rounds) if rounds else 0
    errors = []
    for i in only:
        if i >= len(lines):
            break
        line = lines[i]
        for art, rnd in DRIVER_TAG.findall(line):
            if newest - int(rnd) >= 2 and "(superseded)" not in line:
                errors.append(
                    f"{name}:{i + 1}: [driver {art}] is >=2 rounds older than the "
                    f"newest artifact (BENCH_r{newest:02d}) — refresh the number "
                    f"or mark the line (superseded): {line.strip()[:90]}"
                )
    return errors


def check_roofline(path: str) -> list[str]:
    """ROOFLINE.md: rule-3 ceiling scan over the whole file + rule-4
    staleness over the "MFU summary" section (its summary surface)."""
    records = load_driver_records()
    if not records:
        return ["no BENCH_r*.json driver artifacts found"]
    best_driver = max(v for tiers in records.values() for v in tiers.values())
    with open(path) as f:
        lines = f.read().splitlines()
    errors = check_untagged_ceiling(
        "ROOFLINE", lines, best_driver, 1.15 * best_driver
    )
    try:
        start = next(
            i for i, l in enumerate(lines) if l.startswith("## MFU summary")
        )
        end = next(
            (i for i, l in enumerate(lines[start + 1:], start + 1)
             if l.startswith("## ")),
            len(lines),
        )
    except StopIteration:
        return errors + ["ROOFLINE.md is missing the '## MFU summary' section"]
    errors += check_staleness("ROOFLINE", lines, records, only=range(start, end))
    return errors


def main() -> int:
    errors = check(os.path.join(REPO, "README.md"))
    errors += check_roofline(os.path.join(REPO, "ROOFLINE.md"))
    if errors:
        print("provenance gate FAIL:")
        for e in errors:
            print(" -", e)
        return 1
    print("provenance gate OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
