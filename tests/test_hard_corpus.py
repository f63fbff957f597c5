"""Adversarial end-to-end corpus: non-trivial scores, mirror parity.

Round-1 gap (VERDICT #3): every e2e corpus scored 100% TPR/PPV, so the
evaluator's FP/extrude/fill-gap math (statistics.zig:191-256) and the FSM's
abort/gap-edge paths were only exercised by unit vectors. The --hard corpus
(examples/make_synthetic_corpus.py::synth_hard_stream) scripts deliberate
FN (quiet + single-channel labeled speech), FP (unlabeled loud bursts),
aborted FSM segments (0.4 s bursts), a min-duration-edge segment, an
in-speech gap under max_gap (one bridged segment) and a gap over it (two
segments), plus a reference under the 0.7 s scoring floor.

These tests pin: (a) production-path segments == the sequential f64 mirror
of the Zig semantics, construct by construct; (b) the exact non-trivial
TPR/PPV/FNR/FDR report lines, byte-golden; (c) report-identity between the
pipeline and the mirror through the same evaluator+report chain.

Uses the packaged demo NSNet2 weights (the default neural denoiser).
"""

import numpy as np
import pytest

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)
import make_synthetic_corpus as mc  # noqa: E402

from formula_vad_tpu.config import (  # noqa: E402
    SIMULATOR_STAT_CONFIG,
    StatConfig,
    VADConfig,
)
from formula_vad_tpu.apps.simulator import vad_segments_to_eval  # noqa: E402
from formula_vad_tpu.eval import SpeechSegment, init_and_run, report  # noqa: E402
from formula_vad_tpu.models.registry import load_denoiser  # noqa: E402
from formula_vad_tpu.parallel.runner import BatchRunner  # noqa: E402
from formula_vad_tpu.testing.ref_mirror import PipelineMirror  # noqa: E402

CHUNK = 24000


@pytest.fixture(scope="module")
def corpus():
    # Same construction as `make_synthetic_corpus --hard --seed 0`: one rng
    # drawn through sequentially.
    rng = np.random.default_rng(0)
    streams = [mc.synth_hard_stream(rng, s) for s in mc.HARD_SCRIPTS]
    return streams  # [(audio [2, T], labels [(from, to)]), ...]


@pytest.fixture(scope="module")
def params():
    return load_denoiser("demo")


@pytest.fixture(scope="module")
def pipeline_segments(corpus, params):
    runner = BatchRunner(params, VADConfig(denoiser_model_path="demo"))
    max_t = max(a.shape[1] for a, _ in corpus)
    pad_t = ((max_t + CHUNK - 1) // CHUNK) * CHUNK
    batch = np.zeros((len(corpus), 2, pad_t), np.float32)
    for i, (a, _) in enumerate(corpus):
        batch[i, :, : a.shape[1]] = a
    results = runner.run(batch, [a.shape[1] for a, _ in corpus])
    return [r.segments for r in results]


def _stat_config():
    return StatConfig(
        ignore_shorter_than_sec=0.7,
        extrude_start=SIMULATOR_STAT_CONFIG.extrude_start,
        extrude_end=SIMULATOR_STAT_CONFIG.extrude_end,
        fill_gaps=SIMULATOR_STAT_CONFIG.fill_gaps,
    )


def _report(names, seg_lists, label_lists):
    evaluators = []
    for segs, labels in zip(seg_lists, label_lists):
        refs = [
            SpeechSegment(from_sec=a, to_sec=b, side="ref") for a, b in labels
        ]
        evaluators.append(init_and_run(vad_segments_to_eval(segs, 48000), refs))
    return report.simulation_report(names, evaluators, _stat_config())


@pytest.fixture(scope="module")
def mirror_segments(corpus, params):
    return PipelineMirror(params).run(corpus[0][0])


def test_constructs_behave_and_match_mirror(corpus, mirror_segments, pipeline_segments):
    """Stream 0 through the production batched path == the sequential f64
    mirror, segment boundaries exact, per-segment stats within f32/f64
    tolerance — on audio where the FSM aborts, bridges a gap, and rides the
    min-duration edge."""
    mirror_segs = mirror_segments
    got = pipeline_segments[0]

    assert [(s["sample_from"], s["sample_to"]) for s in got] == [
        (s["sample_from"], s["sample_to"]) for s in mirror_segs
    ]
    for g, m in zip(got, mirror_segs):
        assert g["avg_channel_vol_ratio"] == pytest.approx(
            m["avg_channel_vol_ratio"], abs=1e-5
        )
        assert g["vad_met_sec"] == pytest.approx(m["vad_met_sec"], abs=1e-4)

    # The adversarial constructs (script 0): 4 segments — normal, FP burst,
    # min-duration edge (vad_met ~0.7 s), and ONE segment spanning the
    # 1.6 s in-speech gap; the 0.4 s burst aborted (absent), the quiet
    # burst undetected.
    assert len(got) == 4
    starts_sec = [s["sample_from"] / 48000 for s in got]
    assert starts_sec[0] == pytest.approx(3.1, abs=0.3)    # normal @5 -2s margin
    assert starts_sec[1] == pytest.approx(38.0, abs=0.3)   # FP @40 -2s margin
    assert starts_sec[2] == pytest.approx(73.0, abs=0.3)   # edge @75 -2s margin
    assert starts_sec[3] == pytest.approx(90.0, abs=0.3)   # gappy @92 -2s margin
    assert got[2]["vad_met_sec"] == pytest.approx(0.704, abs=0.05)
    gap_span = (got[3]["sample_to"] - got[3]["sample_from"]) / 48000
    assert gap_span > 4.0 + 3.0  # 1.2+1.6+1.2 bridged + 4 s margins

    # Aborted/missed constructs stayed out.
    for s in got:
        assert not (21.0 < s["sample_from"] / 48000 < 25.0)  # quiet burst
        assert not (57.0 < s["sample_from"] / 48000 < 59.0)  # 0.4 s burst


# The exact report rows for the default demo-weights run — regenerate with
# `python examples/make_synthetic_corpus.py --out D --hard --denoiser demo`
# + `apps.simulator -i D/plan.json` if constructs or weights change.
GOLDEN_ROWS = [
    "|                        hard-00 |   21 |   19 |    6 |    2 |  90.5% |  75.6% |     9.5% |    24.4% |",
    "|                        hard-01 |   28 |   23 |    6 |    5 |  83.1% |  80.2% |    16.9% |    19.8% |",
]
GOLDEN_AGGREGATES = [
    "True positive rate   (TPR):    86.3%",
    "Precision            (PPV):    78.1%",
    "False positives       (FP):    11.8 sec",
    "F-Score (β =  0.70)       :    80.6%",
    "Fowlkes-Mallows index     :    82.1%",
]


def test_report_golden_nontrivial_scores(corpus, pipeline_segments):
    txt = _report(
        ["hard-00", "hard-01"], pipeline_segments, [labels for _, labels in corpus]
    )
    for row in GOLDEN_ROWS:
        assert row in txt, f"missing golden row:\n{row}\nin report:\n{txt}"
    for line in GOLDEN_AGGREGATES:
        assert line in txt, f"missing golden aggregate:\n{line}\nin report:\n{txt}"


def test_mirror_report_identical(corpus, mirror_segments, pipeline_segments):
    """The f64 mirror's segments, pushed through the same evaluator+report
    chain, must render the byte-identical report for stream 0."""
    labels0 = corpus[0][1]
    got = _report(["hard-00"], [pipeline_segments[0]], [labels0])
    want = _report(["hard-00"], [mirror_segments], [labels0])
    assert got == want
