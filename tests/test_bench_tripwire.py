"""Unit tests for bench.py's cross-round regression tripwire
(r10 VERDICT #7): calibrated cpu_total_ratio above the bound must set
``regression: true`` in the artifact instead of relying on narrative."""

import importlib.util
import os


def _bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestRegressionFlag:
    def test_calibrated_over_bound_flags(self):
        b = _bench()
        got = b._regression_flag(
            {"cpu_total_ratio": 1.4, "cpu_total_ratio_calibrated": 1.2}
        )
        assert got == {
            "regression": True,
            "basis": "cpu_total_ratio_calibrated",
            "ratio": 1.2,
            "bound": b._REGRESSION_BOUND,
        }

    def test_calibrated_under_bound_clean_even_if_raw_over(self):
        # a hot box inflates the RAW ratio; calibration divides the host
        # drift out — only the calibrated number decides
        b = _bench()
        got = b._regression_flag(
            {"cpu_total_ratio": 1.4, "cpu_total_ratio_calibrated": 1.05}
        )
        assert got["regression"] is False
        assert got["basis"] == "cpu_total_ratio_calibrated"

    def test_exactly_at_bound_is_clean(self):
        b = _bench()
        got = b._regression_flag(
            {"cpu_total_ratio_calibrated": b._REGRESSION_BOUND}
        )
        assert got["regression"] is False

    def test_uncalibrated_fallback_flags_raw(self):
        # calibration refused (sentinel spread / pre-r9 artifact): the
        # raw ratio still trips the wire, labeled with its basis
        b = _bench()
        got = b._regression_flag(
            {"cpu_total_ratio": 1.3, "cpu_total_ratio_calibrated": None}
        )
        assert got == {
            "regression": True,
            "basis": "cpu_total_ratio",
            "ratio": 1.3,
            "bound": b._REGRESSION_BOUND,
        }

    def test_no_prev_or_no_ratio_is_silent(self):
        b = _bench()
        assert b._regression_flag(None) is None
        assert b._regression_flag({}) is None
        assert b._regression_flag(
            {"note": "sf mismatch; ratios omitted"}
        ) is None
