"""Pinned tail thresholds on the committed quality reports (r5).

VERDICT r4 item 3: the quality harness had committed point-in-time JSON
but no pinned regression thresholds on the tails, so a future round
could silently ship a model with catastrophic outliers.  These tests
read the committed evidence reports and fail the suite if any tail
exceeds its pinned bound.  Bounds sit above the measured values (see
docs/evidence_r5/quality_tail_diagnosis.md for the measured numbers and
the diagnosis protocol) but far below "catastrophic": an attention
collapse (TF-MCD > 10 dB) or a runaway gate (error > 25 frames) trips
them immediately.
"""

import json
import os

import pytest

_EVIDENCE = os.path.join(os.path.dirname(__file__), "..", "docs",
                         "evidence_r5")


def _load(name):
    path = os.path.join(_EVIDENCE, name)
    if not os.path.isfile(path):
        pytest.skip(f"evidence report {name} not committed")
    with open(path) as f:
        return json.load(f)


class TestR5MultiSpeakerTails:
    """The r5 multi-speaker checkpoint's val-split report
    (checkpoints/r5_ms_bf16 on corpus_r5_ms, 16 items, 4 speakers)."""

    def test_teacher_forced_mcd_tails(self):
        rep = _load("quality_r5ms.json")
        s = rep["mcd_teacher_forced_db"]
        assert s["p90"] < 5.0, s
        assert s["max"] < 8.0, s     # measured max 3.8 (epoch-143 probe)

    def test_ar_mcd_tails(self):
        rep = _load("quality_r5ms.json")
        s = rep["mcd_autoregressive_dtw_db"]
        assert s["p90"] < 6.0, s
        assert s["max"] < 9.0, s     # measured max 4.2

    def test_gate_timing_tails(self):
        rep = _load("quality_r5ms.json")
        s = rep["gate_timing_error_frames"]
        assert s["p90"] <= 10.0, s
        assert s["max"] <= 25.0, s   # measured max 1 frame

    def test_per_item_detail_present(self):
        """Every item must be attributable (the r4 21.4 dB outlier was
        undiagnosable from aggregates — quality_tail_diagnosis.md)."""
        rep = _load("quality_r5ms.json")
        assert len(rep["per_item"]) == rep["n_items"]
        for it in rep["per_item"]:
            assert {"index", "speaker_id", "mcd_tf_db"} <= set(it)

    def test_all_speakers_evaluated(self):
        rep = _load("quality_r5ms.json")
        speakers = {it["speaker_id"] for it in rep["per_item"]}
        assert speakers == {0, 1, 2, 3}, speakers


class TestR4ReproductionReport:
    """The r4 checkpoint's reproduced report (quality_tail_diagnosis.md):
    the real teacher-forced tail of the committed r4 artifacts."""

    def test_reproduced_tf_tails(self):
        rep = _load("quality_r4_reproduction.json")
        s = rep["mcd_teacher_forced_db"]
        assert s["max"] < 8.0, s     # measured 6.7 — NOT the r4-reported 21.4
