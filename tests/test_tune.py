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


def test_grid_key_validation():
    with pytest.raises(SystemExit, match="not tunable"):
        tune.parse_grid(["fft_size=512,1024"])
    with pytest.raises(SystemExit, match="expected key"):
        tune.parse_grid(["speech_threshold_factor"])
    # Static-shape keys are accepted (they partition into groups).
    assert tune.parse_grid(["short_term_speech_avg_sec=0.2,0.4"]) == {
        "short_term_speech_avg_sec": [0.2, 0.4]
    }


@pytest.fixture(scope="module")
def easy_plan(tmp_path_factory):
    out = tmp_path_factory.mktemp("tune_easy")
    mc.main(["--out", str(out), "--streams", "2", "--minutes", "0.25",
             "--denoiser", "spectral_gate"])
    return os.path.join(str(out), "plan.json")


def test_static_key_groups(easy_plan, capsys):
    """A static-shape key partitions candidates into per-statics groups;
    the candidate equal to the base config still reproduces the base row."""
    rc = tune.main([
        "-i", easy_plan,
        "--grid", "short_term_speech_avg_sec=0.2,0.4",
        "--grid", "speech_threshold_factor=10,30",
    ])
    captured = capsys.readouterr()
    assert rc == 0
    assert "[group 1/2: " in captured.err and "[group 2/2: " in captured.err
    lines = [ln for ln in captured.out.splitlines() if ln.strip()]
    ranked = [ln for ln in lines if ln.split()[0].isdigit()]
    base = [ln for ln in lines if ln.startswith("base")]
    assert len(ranked) == 4 and len(base) == 1
    # Candidate (short=0.2, factor=10) IS the base config.
    cand_base = next(
        ln for ln in ranked if ln.split()[1] == "0.2" and ln.split()[2] == "10")
    assert cand_base.split()[3:] == base[0].split()[3:]


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
