"""apps/tune.py: one-pass threshold grid search over alt FSM machines.

Uses the adversarial --hard corpus (scores meaningfully below 100%) so
candidates actually differentiate; pins that the candidate equal to the
base config reproduces the base scores exactly (the K-axis vmap is
segment-identical to the primary machine — tests/test_apps.py), the
leaderboard ordering, and the plan-mergeability of --out.
"""

import dataclasses
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))
import make_synthetic_corpus as mc  # noqa: E402

from formula_vad_tpu.apps import tune  # noqa: E402
from formula_vad_tpu.config import sim_config_from_dict  # noqa: E402


@pytest.fixture(scope="module")
def hard_plan(tmp_path_factory):
    out = tmp_path_factory.mktemp("tune_corpus")
    mc.main(["--out", str(out), "--hard", "--denoiser", "demo"])
    return os.path.join(str(out), "plan.json")


def test_grid_rejects_static_shape_keys():
    with pytest.raises(SystemExit, match="not tunable"):
        tune.parse_grid(["long_term_speech_avg_sec=60,180"])
    with pytest.raises(SystemExit, match="expected key"):
        tune.parse_grid(["speech_threshold_factor"])


def test_tune_leaderboard_and_out(hard_plan, tmp_path, capsys):
    best_path = str(tmp_path / "best.json")
    rc = tune.main([
        "-i", hard_plan,
        "--grid", "speech_threshold_factor=3,10,40",
        "--out", best_path,
    ])
    out = capsys.readouterr().out
    assert rc == 0

    lines = [ln for ln in out.splitlines() if ln.strip()]
    ranked = [ln for ln in lines if ln.split()[0].isdigit()]
    base = [ln for ln in lines if ln.startswith("base")]
    assert len(ranked) == 3 and len(base) == 1

    # Leaderboard is sorted by F-score descending.
    def fscore(ln):
        return float(ln.split()[-2].rstrip("%"))

    scores = [fscore(ln) for ln in ranked]
    assert scores == sorted(scores, reverse=True)

    # The candidate equal to the base config (factor=10) must reproduce the
    # base row's scores exactly — the alt machine IS the primary machine.
    cand10 = next(ln for ln in ranked if ln.split()[1] == "10")
    assert cand10.split()[2:] == base[0].split()[2:]

    # Candidates differentiate on the hard corpus (factor=3 over-triggers,
    # factor=40 under-triggers relative to 10).
    assert len({ln.split()[-2] for ln in ranked}) >= 2

    # --out snippet is plan-mergeable: parses back into a SimConfig whose
    # machine config equals the winner's grid value.
    snippet = json.load(open(best_path))
    cfg = sim_config_from_dict(snippet)
    winner_factor = float(ranked[0].split()[1])
    assert cfg.vad_config.vad_machine_config.speech_threshold_factor == winner_factor
    assert dataclasses.asdict(cfg.vad_config.vad_machine_config)[
        "long_term_speech_avg_sec"] == 180.0
