"""As-of join operator semantics (operators/asof.py)."""

from pyspark.sql import functions as F

from hadoop_bam_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (3, 7, "d")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 5, 300.0)],
        ["k", "rt", "v"],
    )
    return left, right


def test_backward_latest_at_or_before(spark):
    left, right = _frames(spark)
    got = {
        r.tag: (r.rt_right, r.v_right)
        for r in asof_join(left, right, "k", "t", "rt").collect()
    }
    assert got["a"] == (8, 100.0)    # 8 <= 10 < 15
    assert got["b"] == (15, 200.0)   # latest <= 20
    assert got["c"] == (5, 300.0)    # equal timestamps match
    assert got["d"] == (None, None)  # key 3 has no right rows


def test_forward_earliest_at_or_after(spark):
    left, right = _frames(spark)
    got = {
        r.tag: r.rt_right
        for r in asof_join(
            left, right, "k", "t", "rt", direction="forward"
        ).collect()
    }
    assert got["a"] == 15   # earliest >= 10
    assert got["b"] is None  # nothing after 20
    assert got["c"] == 5     # equality matches forward too


def test_plan_is_single_window_no_join(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, "k", "t", "rt")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union trick: a window, a union — and NO join operator of any kind
    assert "Window" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_composite_key(spark):
    left = spark.createDataFrame([(1, "x", 10)], ["k1", "k2", "t"])
    right = spark.createDataFrame(
        [(1, "x", 9, 1.0), (1, "y", 9, 2.0)], ["k1", "k2", "rt", "v"]
    )
    rows = asof_join(left, right, ["k1", "k2"], "t", "rt").collect()
    assert len(rows) == 1 and rows[0].v_right == 1.0


def test_null_right_attribute_comes_from_matched_row(spark):
    """When the matched (most recent) right row has a NULL attribute, the
    output must carry that row's null — not stitch the attribute from an
    older right row (a row that never existed)."""
    left = spark.createDataFrame([(1, 20, "a")], ["k", "t", "tag"])
    right = spark.createDataFrame(
        [(1, 5, 111.0, "old"), (1, 10, None, "new")],
        ["k", "rt", "v", "label"],
    )
    row = asof_join(left, right, "k", "t", "rt").collect()[0]
    assert row.rt_right == 10          # matched the newer row...
    assert row.label_right == "new"
    assert row.v_right is None         # ...including its null, not 111.0


def test_timestamp_subsecond_precision_and_type(spark):
    """Timestamp time columns keep sub-second ordering (unix_micros key) and
    the matched right_time column keeps its original timestamp type."""
    from datetime import datetime

    t0 = datetime(2026, 1, 1, 0, 0, 0, 100_000)   # .1s
    t1 = datetime(2026, 1, 1, 0, 0, 0, 400_000)   # .4s
    t2 = datetime(2026, 1, 1, 0, 0, 0, 700_000)   # .7s
    left = spark.createDataFrame([(1, t1)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, t0, "early"), (1, t2, "late")], ["k", "rt", "v"]
    )
    row = asof_join(left, right, "k", "t", "rt").collect()[0]
    # whole-second truncation would see all three at :00 and pick "late"
    assert row.v_right == "early"
    assert row.rt_right == t0          # original timestamp value, not a long


def test_time_chunk_matches_default_hot_key(spark):
    """time_chunk (the chunked hot-key scan) must reproduce the default
    single-window path exactly — exercised on ONE key whose events span
    many small time chunks, backward and forward."""
    import random

    rng = random.Random(11)
    left = spark.createDataFrame(
        [("hot", rng.randint(1, 2000), i) for i in range(300)]
        + [("cold", rng.randint(1, 2000), 1000 + i) for i in range(10)],
        ["k", "t", "uid"],
    )
    right = spark.createDataFrame(
        [("hot", t, float(t)) for t in rng.sample(range(1, 2000), 150)]
        + [("cold", 50, -1.0)],
        ["k", "rt", "v"],
    )
    for direction in ("backward", "forward"):
        base = {
            r["uid"]: (r["rt_right"], r["v_right"])
            for r in asof_join(
                left, right, "k", "t", "rt", direction=direction
            ).collect()
        }
        chunked = {
            r["uid"]: (r["rt_right"], r["v_right"])
            for r in asof_join(
                left, right, "k", "t", "rt", direction=direction,
                time_chunk=64,
            ).collect()
        }
        assert chunked == base, direction
