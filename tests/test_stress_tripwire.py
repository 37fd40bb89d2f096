"""Output-normalized stress tripwire (tools/stress_pipeline.py).

Closes the r11 residual: "output grew" can no longer hide genuine
superlinearity. A query is flagged only when its time growth outruns
BOTH the input-data growth and the output-row growth — pure
output-driven time (pair-generating dedup emitting a bigger result at
bigger SF) normalizes to ~1x per output row and passes, while compute
that blows up past both is a loud CLI failure (exit 1).
"""

import os

import pytest

from hadoop_bam_spark.tools.stress_pipeline import classify, run_stress

SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.01"


class TestClassify:
    def test_linear_passes(self):
        # 10x data, 10x time, output flat: per-input 1.0 -> fine
        r = classify(time_ratio=10, data_ratio=10, rows_ratio=1)
        assert not r["superlinear"]
        assert r["per_input_ratio"] == 1.0

    def test_output_driven_time_passes(self):
        # pair-generator: output grew 30x on 10x data and time tracked
        # the OUTPUT — 1.0 per output row, legitimately not superlinear
        r = classify(time_ratio=30, data_ratio=10, rows_ratio=30)
        assert not r["superlinear"]
        assert r["per_output_ratio"] == 1.0
        assert r["per_input_ratio"] == 3.0

    def test_superlinear_flagged_despite_output_growth(self):
        # the hidden case: output grew 10x but time grew 40x — "output
        # grew" used to excuse this; both normalized ratios now exceed
        # tolerance and it flags
        r = classify(time_ratio=40, data_ratio=10, rows_ratio=10)
        assert r["superlinear"]
        assert r["per_input_ratio"] == 4.0
        assert r["per_output_ratio"] == 4.0

    def test_tolerance_boundary(self):
        # 1.5x per input/output row: under the 1.6 default
        assert classify(15, 10, 10, tolerance=1.6)["superlinear"] is False
        # 1.7x per input/output row: over it
        assert classify(17, 10, 10, tolerance=1.6)["superlinear"] is True

    def test_zero_guards(self):
        # zero output rows / zero data ratio must not divide by zero
        r = classify(time_ratio=5, data_ratio=0, rows_ratio=0)
        assert isinstance(r["superlinear"], bool)


@pytest.mark.skipif(
    not (os.path.exists(SF_SMALL) and os.path.exists(SF_BIG)),
    reason="testdata SF dirs absent")
def test_harness_emits_normalized_columns(spark):
    """End-to-end on two real SF dirs with cheap queries: the artifact
    carries the normalized columns and a superlinear summary list."""
    out = run_stress(SF_SMALL, SF_BIG,
                     queries=["dedup_exact", "repetition_ratios"],
                     reps=1)
    assert out["data_ratio"] > 1
    assert isinstance(out["superlinear"], list)
    for rec in out["queries"].values():
        for key in ("time_ratio", "rows_ratio", "per_input_ratio",
                    "per_output_ratio", "superlinear"):
            assert key in rec, key
