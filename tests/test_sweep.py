"""Chunked prefix scans (operators/sweep.py) vs single-window truth.

The helper must be EXACTLY the classic per-partition window on any
input — including null values, tie rows refined by order columns, and
descending scans — while never building a per-partition-key window.
Tiny chunk sizes force many chunks so the cross-chunk offset
combination is exercised hard.
"""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_bam_spark.operators.sweep import (
    chunked_lead_pos,
    chunked_running_agg,
)


def _data(spark, seed, n=400, with_nulls=True):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        part = rng.choice(["p1", "p2", "p3"])
        pos = rng.randint(1, 500)
        val = None if (with_nulls and rng.random() < 0.25) else rng.randint(-50, 50)
        rows.append((part, pos, val, i))
    return (
        spark.createDataFrame(rows, "part string, pos long, val long, uid long"),
        rows,
    )


@pytest.mark.parametrize("op", ["sum", "max", "min"])
@pytest.mark.parametrize("chunk_size", [7, 64])
def test_running_agg_matches_window(spark, op, chunk_size):
    df, _ = _data(spark, seed=hash((op, chunk_size)) % 1000)
    # unique positions per partition (the documented precondition for the
    # bare-pos ordering): pre-aggregate like every real consumer does
    agg = df.groupBy("part", "pos").agg(getattr(F, op)("val").alias("v"))
    w = (
        Window.partitionBy("part")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r["part"], r["pos"]): r["run"]
        for r in agg.withColumn("run", getattr(F, op)("v").over(w)).collect()
    }
    got = {
        (r["part"], r["pos"]): r["run"]
        for r in chunked_running_agg(
            agg, ["part"], "pos", [("v", op, "run")], chunk_size=chunk_size
        ).collect()
    }
    assert got == want


def test_running_agg_descending_and_ties(spark):
    """Ties refined by an order column; descending position scan."""
    df, _ = _data(spark, seed=5)
    for descending in (False, True):
        pos_o = F.col("pos").desc() if descending else F.col("pos").asc()
        w = (
            Window.partitionBy("part")
            .orderBy(pos_o, F.col("uid").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        want = {
            r["uid"]: r["run"]
            for r in df.withColumn("run", F.max("val").over(w)).collect()
        }
        got = {
            r["uid"]: r["run"]
            for r in chunked_running_agg(
                df,
                ["part"],
                "pos",
                [(F.col("val"), "max", "run")],
                order_cols=[F.col("uid").asc()],
                descending=descending,
                chunk_size=13,
            ).collect()
        }
        assert got == want, f"descending={descending}"


def test_running_agg_multi_spec_and_expressions(spark):
    """Several simultaneous scans incl. conditional expressions (the
    closest-operator shape)."""
    df, _ = _data(spark, seed=9)
    w = (
        Window.partitionBy("part")
        .orderBy(F.col("pos").asc(), F.col("uid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cond = F.when(F.col("uid") % 2 == 0, F.col("val"))
    want = {
        r["uid"]: (r["a"], r["b"])
        for r in df.withColumn("a", F.sum("val").over(w))
        .withColumn("b", F.max(cond).over(w))
        .collect()
    }
    got = {
        r["uid"]: (r["a"], r["b"])
        for r in chunked_running_agg(
            df,
            ["part"],
            "pos",
            [("val", "sum", "a"), (cond, "max", "b")],
            order_cols=[F.col("uid").asc()],
            chunk_size=11,
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("chunk_size", [7, 1000])
def test_lead_pos_matches_window(spark, chunk_size):
    df, _ = _data(spark, seed=3)
    agg = df.groupBy("part", "pos").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("part").orderBy("pos")
    want = {
        (r["part"], r["pos"]): r["nxt"]
        for r in agg.withColumn("nxt", F.lead("pos").over(w)).collect()
    }
    got = {
        (r["part"], r["pos"]): r["_next"]
        for r in chunked_lead_pos(
            agg, ["part"], "pos", chunk_size=chunk_size
        ).collect()
    }
    assert got == want


def test_rejects_unknown_op(spark):
    df, _ = _data(spark, seed=1, n=5)
    with pytest.raises(ValueError, match="unsupported running op"):
        chunked_running_agg(df, ["part"], "pos", [("val", "avg", "x")])
