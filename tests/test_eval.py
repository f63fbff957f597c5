"""Evaluator / statistics / formats tests — including the reference's own
inline test vectors from statistics.zig:286-360."""

import numpy as np
import pytest

from formula_vad_tpu.config import StatConfig
from formula_vad_tpu.eval import SpeechSegment, formats, init_and_run, report, statistics


def vad_seg(a, b):
    return SpeechSegment(from_sec=a, to_sec=b, side="vad")


def ref_seg(a, b):
    return SpeechSegment(from_sec=a, to_sec=b, side="ref")


class TestEvaluatorMatching:
    def test_overlap_matching(self):
        ev = init_and_run(
            [vad_seg(1, 3), vad_seg(10, 12)],
            [ref_seg(2, 4), ref_seg(20, 22)],
        )
        assert ev.input_segments[0].opposite_indices == [0]
        assert ev.input_segments[1].opposite_indices == []
        assert ev.reference_segments[0].opposite_indices == [0]
        assert ev.reference_segments[1].opposite_indices == []

    def test_touching_segments_do_not_match(self):
        # overlap must be strictly > 0 (SpeechSegment.zig:41-52)
        ev = init_and_run([vad_seg(1, 2)], [ref_seg(2, 3)])
        assert ev.input_segments[0].opposite_indices == []

    def test_sorting_and_ids(self):
        ev = init_and_run([vad_seg(5, 6), vad_seg(1, 2)], [])
        assert [s.from_sec for s in ev.input_segments] == [1, 5]
        assert [s.id for s in ev.input_segments] == [1, 2]


class TestStatistics:
    def test_calc_false_positive_reference_case_1(self):
        """statistics.zig test 'calcFalsePositiveSec #1': refs (2,3),(4,5),
        vad (1,6), extrude 2/2 fill 2 -> FP == 0."""
        ev = init_and_run([vad_seg(1, 6)], [ref_seg(2, 3), ref_seg(4, 5)])
        config = StatConfig(extrude_start=2, extrude_end=2, fill_gaps=2)
        fp = statistics.calc_false_positive_sec(ev, ev.input_segments[0], config)
        assert fp == pytest.approx(0.0, abs=1e-3)

    def test_calc_false_positive_reference_case_2(self):
        """statistics.zig test 'calcFalsePositiveSec #2': vad (1,10) -> FP == 3."""
        ev = init_and_run([vad_seg(1, 10)], [ref_seg(2, 3), ref_seg(4, 5)])
        config = StatConfig(extrude_start=2, extrude_end=2, fill_gaps=2)
        fp = statistics.calc_false_positive_sec(ev, ev.input_segments[0], config)
        assert fp == pytest.approx(3.0, abs=1e-3)

    def test_false_negative(self):
        ev = init_and_run([vad_seg(2, 3)], [ref_seg(1, 5)])
        fn = statistics.calc_false_negative_sec(ev, ev.reference_segments[0])
        assert fn == pytest.approx(3.0)

    def test_ignore_short_refs(self):
        # refs shorter than the threshold are skipped for FN (statistics.zig:96-102)
        ev = init_and_run([], [ref_seg(1, 1.5)])
        stats = statistics.from_evaluator(ev, StatConfig(ignore_shorter_than_sec=0.7))
        assert stats.false_negatives_sec == 0.0
        assert stats.total_positives_sec == 0.0
        stats2 = statistics.from_evaluator(ev, StatConfig(ignore_shorter_than_sec=0.4))
        assert stats2.false_negatives_sec == pytest.approx(0.5)
        assert stats2.total_positives_sec == pytest.approx(0.5)

    def test_perfect_detection_stats(self):
        ev = init_and_run([vad_seg(1, 3)], [ref_seg(1, 3)])
        s = statistics.from_evaluator(ev, StatConfig())
        assert s.true_positive_rate == pytest.approx(1.0)
        assert s.precision == pytest.approx(1.0)
        assert s.f_score == pytest.approx(1.0)
        assert s.fm_index == pytest.approx(1.0)

    def test_f_score_formula(self):
        # F_beta = (1+b^2) * P*R / (b^2*P + R)
        assert statistics.f_score(0.7, 0.9, 0.8) == pytest.approx(
            (1 + 0.49) * 0.72 / (0.49 * 0.9 + 0.8), rel=1e-5
        )

    def test_aggregate(self):
        ev1 = init_and_run([vad_seg(0, 10)], [ref_seg(0, 10)])
        ev2 = init_and_run([vad_seg(0, 5), vad_seg(20, 26)], [ref_seg(0, 10)])
        s1 = statistics.from_evaluator(ev1, StatConfig())
        s2 = statistics.from_evaluator(ev2, StatConfig())
        agg = statistics.aggregate([s1, s2])
        assert agg.true_positive_rate.max == pytest.approx(1.0)
        assert agg.true_positive_rate.min == pytest.approx(s2.true_positive_rate)
        assert agg.total_positives_sec == pytest.approx(
            s1.total_positives_sec + s2.total_positives_sec
        )


class TestFormats:
    def test_parse(self):
        txt = "1.5\t2.5\tspeech\n\nbadline\n3.0\t4.0\tmore\n"
        segs = formats.parse_audacity_segments(txt)
        assert [(s.from_sec, s.to_sec) for s in segs] == [(1.5, 2.5), (3.0, 4.0)]

    def test_parse_crlf(self):
        segs = formats.parse_audacity_segments("1.0\t2.0\tx\r\n3.0\t4.0\ty\r\n")
        assert len(segs) == 2

    def test_serialize(self):
        ev = init_and_run(
            [vad_seg(1, 2), vad_seg(8, 9)], [ref_seg(1.5, 2.5), ref_seg(5, 6)]
        )
        ev.input_segments[0].debug_info = "vr:0.80 vad:1.0s"
        txt = formats.serialize_evaluator_to_audacity_txt(ev)
        lines = txt.strip().split("\n")
        assert lines[0] == "1.0000\t2.0000\tvr:0.80 vad:1.0s"
        assert lines[1] == "8.0000\t9.0000\tUNMATCHED "
        assert lines[2] == "5.0000\t6.0000\tmissed"


class TestReport:
    def test_report_renders(self):
        ev = init_and_run([vad_seg(0, 10)], [ref_seg(0, 10)])
        txt = report.simulation_report(["TestDriver"], [ev], StatConfig())
        assert "=> Performance Report" in txt
        assert "TestDriver" in txt
        assert "=> Aggregate stats" in txt
        assert "F-Score" in txt
        # row format: "| <30-wide name> | .." with 100.0% TPR
        assert "| 100.0% | 100.0% |" in txt

    def test_evaluator_report(self):
        ev = init_and_run([vad_seg(0, 10)], [ref_seg(0, 10)])
        s = statistics.from_evaluator(ev, StatConfig())
        txt = report.evaluator_report(s)
        assert "True positive rate   (TPR):  100.00 %" in txt
