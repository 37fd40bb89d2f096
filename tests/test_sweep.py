"""Chunked prefix scans (operators/sweep.py) vs single-window truth.

The fused ``chunked_scan`` must be EXACTLY the classic per-partition
RANGE-frame window on any input — including null values, duplicate
positions (which share the running value under range semantics),
descending (suffix) scans, and strict frames — while never building a
per-partition-key window. Tiny chunk sizes force many chunks so the
cross-chunk offset combination is exercised hard.
"""

import random
import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_bam_spark.operators.sweep import (
    chunked_lead_pos,
    chunked_running_agg,
    chunked_scan,
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


def _truth_frame(direction, strict):
    if direction == "asc":
        return (Window.unboundedPreceding, -1 if strict else 0)
    return (1 if strict else 0, Window.unboundedFollowing)


@pytest.mark.parametrize("op", ["sum", "max", "min"])
@pytest.mark.parametrize("chunk_size", [7, 64])
def test_running_agg_matches_window(spark, op, chunk_size):
    df, _ = _data(spark, seed=hash((op, chunk_size)) % 1000)
    # unique positions per partition: pre-aggregate like every real
    # boundary-sweep consumer does
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


@pytest.mark.parametrize("direction", ["asc", "desc"])
@pytest.mark.parametrize("strict", [False, True])
def test_scan_matches_range_window_with_ties(spark, direction, strict):
    """Duplicate positions: range-frame semantics — rows at one position
    share the running value (inclusive sees all of them, strict none)."""
    df, _ = _data(spark, seed=hash((direction, strict)) % 997)
    lo, hi = _truth_frame(direction, strict)
    w = Window.partitionBy("part").orderBy("pos").rangeBetween(lo, hi)
    want = {
        r["uid"]: (r["a"], r["b"])
        for r in df.withColumn("a", F.max("val").over(w))
        .withColumn("b", F.sum("val").over(w))
        .collect()
    }
    got = {
        r["uid"]: (r["a"], r["b"])
        for r in chunked_scan(
            df,
            ["part"],
            "pos",
            [
                ("val", "max", "a", direction, strict),
                ("val", "sum", "b", direction, strict),
            ],
            chunk_size=13,
        ).collect()
    }
    assert got == want


def test_running_agg_descending_wrapper(spark):
    df, _ = _data(spark, seed=5)
    w = (
        Window.partitionBy("part")
        .orderBy("pos")
        .rangeBetween(0, Window.unboundedFollowing)
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
            descending=True,
            chunk_size=13,
        ).collect()
    }
    assert got == want


def test_scan_mixed_directions_and_expressions(spark):
    """Several simultaneous scans in BOTH directions incl. conditional
    expressions (the closest-operator shape) — all in one call."""
    df, _ = _data(spark, seed=9)
    wA = (
        Window.partitionBy("part")
        .orderBy("pos")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wD = (
        Window.partitionBy("part")
        .orderBy("pos")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    cond = F.when(F.col("uid") % 2 == 0, F.col("val"))
    want = {
        r["uid"]: (r["a"], r["b"], r["c"])
        for r in df.withColumn("a", F.sum("val").over(wA))
        .withColumn("b", F.max(cond).over(wA))
        .withColumn("c", F.min(cond).over(wD))
        .collect()
    }
    got = {
        r["uid"]: (r["a"], r["b"], r["c"])
        for r in chunked_scan(
            df,
            ["part"],
            "pos",
            [
                ("val", "sum", "a"),
                (cond, "max", "b"),
                (cond, "min", "c", "desc", True),
            ],
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


def test_fused_scan_is_one_window_pass(spark):
    """The whole point of the fusion: however many specs (both
    directions, strict and not, plus the lead), the DATA side of the
    plan carries exactly ONE Window node over (part, chunk) and one
    over the chunk summary — not one exchange+sort per spec."""
    df, _ = _data(spark, seed=21)
    agg = df.groupBy("part", "pos").agg(F.sum("val").alias("v"))
    out = chunked_scan(
        agg,
        ["part"],
        "pos",
        [
            ("v", "sum", "run"),
            ("v", "max", "hi"),
            ("v", "min", "ahead", "desc"),
            (F.col("pos"), "min", "nxt", "desc", True),
        ],
        chunk_size=13,
    )
    def shape(df):
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        return (
            len(re.findall(r"^\(\d+\) Window", plan, re.M)),
            len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
        )

    # at most one Window per (side, direction): asc+desc on the data
    # pass + asc+desc on the summary — NOT one per spec
    assert shape(out)[0] == 4
    # the exchange count is CONSTANT in the number of specs (the
    # pre-fusion form paid a full exchange+sort+summary round per scan);
    # the desc family costs one extra Sort, never an Exchange
    one_spec = chunked_scan(
        agg, ["part"], "pos", [("v", "sum", "run")], chunk_size=13
    )
    assert shape(one_spec)[0] == 2
    assert shape(out)[1] == shape(one_spec)[1]


def test_rejects_unknown_op_and_direction(spark):
    df, _ = _data(spark, seed=1, n=5)
    with pytest.raises(ValueError, match="unsupported running op"):
        chunked_running_agg(df, ["part"], "pos", [("val", "avg", "x")])
    with pytest.raises(ValueError, match="direction must be"):
        chunked_scan(df, ["part"], "pos", [("val", "sum", "x", "up")])


def test_single_window_form_matches_chunked(spark):
    """chunk_size=SINGLE_WINDOW (the adaptive small-input form) must be
    value-identical to the chunked decomposition on every spec shape."""
    from hadoop_bam_spark.operators.sweep import SINGLE_WINDOW

    df, _ = _data(spark, seed=21)
    specs = [
        ("val", "max", "a", "asc", False),
        ("val", "sum", "b", "asc", True),
        ("val", "min", "c", "desc", False),
        (F.col("pos"), "min", "nxt", "desc", True),
    ]
    want = {
        r["uid"]: (r["a"], r["b"], r["c"], r["nxt"])
        for r in chunked_scan(df, ["part"], "pos", specs, chunk_size=13).collect()
    }
    got = {
        r["uid"]: (r["a"], r["b"], r["c"], r["nxt"])
        for r in chunked_scan(
            df, ["part"], "pos", specs, chunk_size=SINGLE_WINDOW
        ).collect()
    }
    assert got == want
    # the single-window plan must carry NO join (no summary round)
    plan = chunked_scan(
        df, ["part"], "pos", specs, chunk_size=SINGLE_WINDOW
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_adaptive_policy_decisions(spark, monkeypatch):
    """resolve_chunk_size: explicit forces; small+balanced -> single
    window; small+skewed -> chunked; big/unknown -> chunked; no
    part_cols -> chunked."""
    import hadoop_bam_spark.operators.sweep as sweep_mod
    from hadoop_bam_spark.operators.sweep import (
        SINGLE_WINDOW,
        resolve_chunk_size,
    )

    # spark.range has exact Catalyst stats (unlike createDataFrame's
    # RDD-backed Long.MAX default)
    balanced = spark.range(0, 1000).select(
        (F.col("id") % 8).alias("part"), (F.col("id") + 1).alias("pos")
    )
    skewed = spark.range(0, 1000).select(
        F.lit(0).alias("part"), (F.col("id") + 1).alias("pos")
    )
    assert resolve_chunk_size(balanced, 42, 99) == 42          # explicit
    assert resolve_chunk_size(balanced, SINGLE_WINDOW, 99) == SINGLE_WINDOW
    assert resolve_chunk_size(balanced, None, 99) is not None
    assert (
        resolve_chunk_size(balanced, None, 99, ["part"]) == SINGLE_WINDOW
    )
    assert resolve_chunk_size(balanced, None, 99) == 99        # no part_cols
    # decisions are memoized per semantic plan — repeat costs no probe
    assert (
        resolve_chunk_size(balanced, None, 99, ["part"]) == SINGLE_WINDOW
    )
    monkeypatch.setattr(sweep_mod, "ADAPTIVE_SINGLE_MAX_KEY_ROWS", 200)
    sweep_mod._DECISION_CACHE.clear()
    assert resolve_chunk_size(skewed, None, 99, ["part"]) == 99  # hot key
    assert (
        resolve_chunk_size(balanced, None, 99, ["part"]) == SINGLE_WINDOW
    )
    monkeypatch.setattr(sweep_mod, "ADAPTIVE_SINGLE_MAX_BYTES", 16)
    sweep_mod._DECISION_CACHE.clear()
    assert resolve_chunk_size(balanced, None, 99, ["part"]) == 99  # too big
    sweep_mod._DECISION_CACHE.clear()


def test_summary_join_not_force_broadcast_on_high_cardinality(spark):
    """r16 broadcast guard: with the default (auto) setting the chunk
    summary join carries NO static broadcast hint — a high-cardinality
    partition key (one per row: #keys x #chunks summary rows) must not
    be forced into executor memory; AQE sizes the join at runtime.
    broadcast_summary=True still forces the hint."""
    # RDD-backed frame: Catalyst cannot prove the summary small (stats =
    # Long.MAX) — exactly the shape where only a forced hint would
    # broadcast, i.e. the r15 OOM risk
    n = 5000
    df = spark.createDataFrame(
        [(str(i), i % 97 + 1, 1) for i in range(n)],
        "part string, pos long, val long",
    )
    specs = [("val", "sum", "run")]

    def spark_plan(bs):
        return (
            chunked_scan(df, ["part"], "pos", specs, chunk_size=7,
                         broadcast_summary=bs)
            ._jdf.queryExecution().sparkPlan().toString()
        )

    assert "BroadcastHashJoin" not in spark_plan(None)
    assert "BroadcastHashJoin" not in spark_plan(False)
    assert "BroadcastHashJoin" in spark_plan(True)
    # and the auto form is still exact
    got = chunked_scan(
        df, ["part"], "pos", specs, chunk_size=7
    ).agg(F.sum("run")).collect()[0][0]
    assert got == n


def test_chunked_scan_null_partition_keys(spark):
    """NULL partition-column values must get the same cross-chunk offsets
    as real values (r16 ADVICE high: the summary join was a plain
    column-list equi-join, so NULL-keyed rows lost every ``_off_*`` offset
    on the chunked path while the single-window path answered correctly —
    a silent divergence between the two adaptive forms)."""
    rows = []
    rng = random.Random(41)
    for i in range(300):
        part = rng.choice(["p1", None, "p2", None])
        rows.append((part, rng.randint(1, 500), rng.randint(-50, 50), i))
    df = spark.createDataFrame(rows, "part string, pos long, val long, uid long")
    specs = [
        ("val", "sum", "run", "asc", False),
        ("val", "max", "peak", "desc", True),
    ]
    want = {
        r["uid"]: (r["run"], r["peak"])
        for r in chunked_scan(df, ["part"], "pos", specs, chunk_size=0).collect()
    }
    got = {
        r["uid"]: (r["run"], r["peak"])
        for r in chunked_scan(df, ["part"], "pos", specs, chunk_size=17).collect()
    }
    assert got == want
    # and at least one NULL-part row must actually carry a non-null offset
    # combination (i.e. the run at a late position reflects earlier chunks)
    null_runs = [
        r["run"]
        for r in chunked_scan(df, ["part"], "pos", specs, chunk_size=17)
        .filter(F.col("part").isNull() & (F.col("pos") > 400))
        .collect()
    ]
    assert null_runs, "fixture must cover NULL-part rows in late chunks"


def test_chunked_scan_reuses_one_exchange(spark):
    """The chunk-summary branch must read the SAME shuffle as the data
    pass (ReusedExchange), never re-execute the upstream subtree (r17:
    pileup's whole reads-join-explode pipeline was planned twice)."""
    df, _ = _data(spark, seed=9)
    # a non-trivial upstream: an aggregate the planner would otherwise
    # happily duplicate into both branches
    agg = df.groupBy("part", "pos").agg(F.sum("val").alias("v"))
    out = chunked_scan(agg, ["part"], "pos", [("v", "sum", "run")], chunk_size=13)
    # AQE applies stage reuse at RUNTIME: the static plan shows two
    # independent subtrees, the final (post-execution) adaptive plan must
    # show the summary branch reading the data pass's shuffle. collect()
    # (not count(): that builds a SEPARATE query execution) finalizes
    # THIS DataFrame's AdaptiveSparkPlan.
    out.collect()
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "ReusedExchange" in plan, plan


def test_chunked_scan_pre_agg_matches_plain_groupby(spark):
    """``pre_agg`` (r18) fuses the one-row-per-position aggregate into the
    scan's own exchange; the result must be EXACTLY groupBy + chunked_scan
    on both the chunked and the single-window paths (including NULL
    partition keys and NULL aggregate inputs)."""
    df, _ = _data(spark, seed=18)
    df = df.withColumn(
        "part", F.when(F.col("uid") % 7 == 0, F.lit(None)).otherwise("part")
    )
    specs = [
        ("v", "sum", "run"),
        (F.col("pos"), "min", "nxt", "desc", True),
    ]
    pre = [F.sum("val").alias("v")]
    for cs in (13, 0):
        want = {
            (r["part"], r["pos"]): (r["v"], r["run"], r["nxt"])
            for r in chunked_scan(
                df.groupBy("part", "pos").agg(*pre),
                ["part"], "pos", specs, chunk_size=cs,
            ).collect()
        }
        got = {
            (r["part"], r["pos"]): (r["v"], r["run"], r["nxt"])
            for r in chunked_scan(
                df, ["part"], "pos", specs, chunk_size=cs, pre_agg=pre
            ).collect()
        }
        assert got == want, f"chunk_size={cs}"


def test_chunked_scan_pre_agg_single_exchange(spark):
    """The fused pre-aggregate must NOT add its own exchange: the executed
    plan carries exactly ONE shuffle of the event table (the scan's
    (key, chunk) repartition), where the standalone groupBy form paid a
    second hash(part, pos) exchange immediately before it."""
    df, _ = _data(spark, seed=19)
    pre = [F.sum("val").alias("v")]
    specs = [("v", "sum", "run")]

    def n_exchanges(out):
        out.collect()
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        # executed (final) adaptive plan only; count real shuffles
        # (Exchange), not Broadcast/ReusedExchange
        final = plan.split("== Initial Plan ==")[0]
        return len(re.findall(r"\bExchange \(\d+\)", final))

    fused = n_exchanges(
        chunked_scan(df, ["part"], "pos", specs, chunk_size=13, pre_agg=pre)
    )
    plain = n_exchanges(
        chunked_scan(
            df.groupBy("part", "pos").agg(*pre),
            ["part"], "pos", specs, chunk_size=13,
        )
    )
    # both forms keep the O(#chunks) summary-offset exchange; the fused
    # form drops the event table's second full shuffle (the baseline's
    # exact count varies with AQE's join choice, but is always larger)
    assert fused == 2, f"fused form shuffles {fused}x (want data + summary)"
    assert plain > fused, f"baseline {plain} vs fused {fused}"


def test_chunked_scan_empty_part_cols(spark):
    """part_cols=[] (ADVICE r17 low): the chunked path must key on the
    chunk alone — no zero-field struct key — and still equal the
    single-window form."""
    df, _ = _data(spark, seed=20)
    specs = [("val", "sum", "run"), ("val", "max", "peak", "desc", True)]
    want = {
        r["uid"]: (r["run"], r["peak"])
        for r in chunked_scan(df, [], "pos", specs, chunk_size=0).collect()
    }
    got = {
        r["uid"]: (r["run"], r["peak"])
        for r in chunked_scan(df, [], "pos", specs, chunk_size=17).collect()
    }
    assert got == want


def test_resolve_trivial_size_skips_probe(spark, monkeypatch):
    """A trivially small input (size bound alone caps rows under the
    per-key bound) must decide single-window WITHOUT running the skew
    probe job (VERDICT r17 next #7: the probe executed the full upstream
    a second time at DataFrame-construction time)."""
    import hadoop_bam_spark.operators.sweep as sweep_mod
    from pyspark.sql import DataFrame

    # fully skewed AND tiny: the old policy probed (and still chose
    # single); the new policy must choose single with NO job at all
    df = spark.range(0, 100).select(
        F.lit(0).alias("part"), (F.col("id") + 1).alias("pos")
    )

    def boom(self, *a, **k):
        raise AssertionError("probe job ran on a trivially small input")

    sweep_mod._DECISION_CACHE.clear()
    monkeypatch.setattr(DataFrame, "collect", boom)
    try:
        got = sweep_mod.resolve_chunk_size(df, None, 99, ["part"])
    finally:
        sweep_mod._DECISION_CACHE.clear()
    assert got == sweep_mod.SINGLE_WINDOW
