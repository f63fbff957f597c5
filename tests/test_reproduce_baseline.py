"""End-to-end check of scripts/reproduce_baseline.py without the real corpus.

The harness exists for the one asset set this environment lacks (the
reference's 21 labeled recordings + nsnet2-20ms-baseline.onnx,
README.md:26-62 / .MISSING_LARGE_BLOBS:1).  These tests prove the harness
itself works by round-tripping it on the synthetic corpus: a run's own
emitted table must gate PASS, a perturbed table must gate FAIL, and the
parser must read the real BASELINE.md verbatim.
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))
import make_synthetic_corpus as mc  # noqa: E402


def _load_rb():
    spec = importlib.util.spec_from_file_location(
        "reproduce_baseline", os.path.join(REPO, "scripts", "reproduce_baseline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


rb = _load_rb()


def test_parses_real_baseline_md():
    rows = rb.parse_baseline_table(os.path.join(REPO, "BASELINE.md"))
    assert len(rows) == 21
    gasly = rows["2023 Miami Race - Gasly"]
    assert gasly["p"] == 1447 and gasly["tpr"] == 94.1 and gasly["fdr"] == 1.7
    perez = rows["2023 Monaco FP1 - Perez"]
    assert perez["tp"] == 1135 and perez["ppv"] == 99.6


@pytest.fixture(scope="module")
def corpus_plan(tmp_path_factory):
    out = tmp_path_factory.mktemp("rb_corpus")
    mc.main(["--out", str(out), "--streams", "2", "--minutes", "0.25",
             "--denoiser", "spectral_gate"])
    return os.path.join(str(out), "plan.json")


def test_roundtrip_pass_and_perturbed_fail(corpus_plan, tmp_path, capsys):
    emitted = str(tmp_path / "emitted.md")
    assert rb.main(["--plan", corpus_plan, "--emit-baseline", emitted]) == 0
    capsys.readouterr()

    # The run's own table must gate PASS...
    assert rb.main(["--plan", corpus_plan, "--baseline", emitted]) == 0
    text = capsys.readouterr().out
    assert "FAIL" not in text and "2 matched" in text

    # ...and a 1.0 pp perturbation of one rate must gate FAIL.
    with open(emitted) as f:
        lines = f.read().splitlines(keepends=True)
    rows = rb.parse_baseline_table(emitted)
    name, row = next(iter(rows.items()))
    bad = str(tmp_path / "perturbed.md")
    with open(bad, "w") as f:
        for ln in lines:
            if ln.startswith(f"| {name} |"):
                ln = ln.replace(f"{row['tpr']:.1f}%", f"{row['tpr'] - 1.0:.1f}%", 1)
            f.write(ln)
    assert rb.main(["--plan", corpus_plan, "--baseline", bad]) == 1
    assert "FAIL" in capsys.readouterr().out


def test_unmatched_instance_fails_unless_allowed(corpus_plan, tmp_path, capsys):
    # A baseline whose names don't match the plan: hard failure by default,
    # rc 2 (no matches) with --allow-missing.
    stranger = str(tmp_path / "stranger.md")
    with open(stranger, "w") as f:
        f.write("## Per-recording\n\n")
        f.write("| Name | P | TP | FP | FN | TPR | PPV | FNR | FDR |\n")
        f.write("|---|---|---|---|---|---|---|---|---|\n")
        f.write("| nobody | 10 | 10 | 0 | 0 | 100.0% | 100.0% | 0.0% | 0.0% |\n")
    assert rb.main(["--plan", corpus_plan, "--baseline", stranger]) == 1
    capsys.readouterr()
    assert rb.main(["--plan", corpus_plan, "--baseline", stranger,
                    "--allow-missing"]) == 2
    capsys.readouterr()


def test_full_real_assets_path_with_onnx(tmp_path_factory, tmp_path, capsys):
    """Dry-run of the EXACT procedure a user with the real assets runs
    (VERDICT round-3 next-#8): a fake 'Miami' corpus (synthetic audio +
    labels) plus a trained-weights ONNX produced by ``export_nsnet2_onnx``
    — the same exporter the train CLI uses — driven through
    ``reproduce_baseline.py --plan ... --onnx ...``. Exercises the full
    CLI path: ONNX load through the importer, instance-to-table name
    matching, and the tolerance gate; then a perturbed RECORDING (not a
    perturbed table) must flip the gate to FAIL."""
    from formula_vad_tpu.io_ import wav as wav_mod
    from formula_vad_tpu.models import onnx_import
    from formula_vad_tpu.models.registry import load_denoiser

    out = tmp_path_factory.mktemp("rb_onnx_corpus")
    mc.main(["--out", str(out), "--streams", "2", "--minutes", "0.25",
             "--denoiser", "demo"])
    plan = os.path.join(str(out), "plan.json")

    # The stand-in for data/nsnet2-20ms-baseline.onnx: the packaged demo
    # weights exported to a genuine ONNX blob.
    onnx_path = str(tmp_path / "nsnet2-20ms-baseline.onnx")
    with open(onnx_path, "wb") as f:
        f.write(onnx_import.export_nsnet2_onnx(load_denoiser("demo")))

    emitted = str(tmp_path / "emitted.md")
    assert rb.main(["--plan", plan, "--onnx", onnx_path,
                    "--emit-baseline", emitted]) == 0
    capsys.readouterr()
    assert len(rb.parse_baseline_table(emitted)) == 2

    # Same assets again: the gate must PASS against the emitted table.
    assert rb.main(["--plan", plan, "--onnx", onnx_path,
                    "--baseline", emitted]) == 0
    text = capsys.readouterr().out
    assert "FAIL" not in text and "2 matched" in text

    # Perturb one RECORDING (silence it) and re-run: its TPR collapses and
    # the per-recording tolerance gate must FAIL.
    import json as _json

    with open(plan) as f:
        inst0 = _json.load(f)["instances"][0]
    wav_path = os.path.join(str(out), inst0["audio_path"])
    data, rate = wav_mod.read_wav(wav_path)
    wav_mod.write_wav(wav_path, data * 0.0, rate)
    assert rb.main(["--plan", plan, "--onnx", onnx_path,
                    "--baseline", emitted]) == 1
    assert "FAIL" in capsys.readouterr().out
