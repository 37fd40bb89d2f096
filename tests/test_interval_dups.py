"""Duplicate left-row support for the regroup interval operators (r16).

bedtools emits one output line per INPUT line — duplicated input rows
included. Through r15 interval_closest/coverage/map/subtract keyed their
recombining regroup on the whole left tuple, so duplicates silently
collapsed (and coverage/map counts could double through the joined
copies). r16 carries a per-tuple count through the regroup and re-emits
per input row; these tests feed deliberately duplicated inputs and check
each output is exactly the unique-input result with every row repeated
its input multiplicity — values computed ONCE per tuple, not per copy.
"""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from hadoop_bam_spark.operators.interval_join import (
    interval_closest,
    interval_coverage,
    interval_map,
    interval_subtract,
)

CONTIGS = ["c1", "c2"]
AXIS = 800


@pytest.fixture(scope="module")
def dup_frames(spark):
    rng = random.Random(20260816)
    uniq = []
    for i in range(40):
        c = rng.choice(CONTIGS)
        s = rng.randint(1, AXIS)
        uniq.append((c, s, s + rng.randint(0, 60), f"L{i}"))
    # multiplicities 1..3, deterministic per row
    dup = [row for i, row in enumerate(uniq) for _ in range(i % 3 + 1)]
    mult = Counter((i % 3 + 1) for i in range(len(uniq)))
    assert mult[2] and mult[3], "fixture must contain real duplicates"
    right = []
    for i in range(30):
        c = rng.choice(CONTIGS)
        s = rng.randint(1, AXIS)
        right.append((c, s, s + rng.randint(0, 50), i % 5))
    schema_l = "contig string, start long, stop long, name string"
    ldf_u = spark.createDataFrame(uniq, schema_l)
    ldf_d = spark.createDataFrame(dup, schema_l)
    rdf = spark.createDataFrame(
        right, "contig string, start long, stop long, score long"
    )
    return uniq, dup, ldf_u, ldf_d, rdf


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


def _expected(df_unique_result, uniq_rows, dup_rows, name_idx=3):
    """unique-input result rows, repeated per input multiplicity (keyed by
    the distinguishing name column, which is unique in the fixture)."""
    mult = Counter(r[name_idx] for r in dup_rows)
    out = Counter()
    for row, n in _multiset(df_unique_result).items():
        assert n == 1, f"unique-input result must be duplicate-free: {row}"
        out[row] = mult[row[name_idx]]
    return out


@pytest.mark.parametrize("report", [False, True])
def test_closest_reemits_per_input_row(spark, dup_frames, report):
    uniq, dup, ldf_u, ldf_d, rdf = dup_frames
    kw = dict(keys=("contig", "start", "stop"), report_right=report)
    want = _expected(interval_closest(ldf_u, rdf, **kw), uniq, dup)
    got = _multiset(interval_closest(ldf_d, rdf, **kw))
    assert got == want


@pytest.mark.parametrize("bin_size", [16384, 64])
def test_coverage_reemits_and_does_not_double_count(
    spark, dup_frames, bin_size
):
    uniq, dup, ldf_u, ldf_d, rdf = dup_frames
    kw = dict(keys=("contig", "start", "stop"), bin_size=bin_size)
    want = _expected(interval_coverage(ldf_u, rdf, **kw), uniq, dup)
    got = _multiset(interval_coverage(ldf_d, rdf, **kw))
    assert got == want
    # n_overlaps must be the per-tuple truth (copies of one tuple agree),
    # not multiplied by the input multiplicity
    rrows = [tuple(r) for r in rdf.collect()]
    brute = {}
    for c, s, e, name in uniq:
        brute[name] = sum(
            1 for rc, rs, re_, _ in rrows if rc == c and rs <= e and s <= re_
        )
    for row in got:
        assert row[4] == brute[row[3]]


@pytest.mark.parametrize("bin_size", [16384, 64])
def test_map_reemits_and_does_not_double_sum(spark, dup_frames, bin_size):
    uniq, dup, ldf_u, ldf_d, rdf = dup_frames
    specs = [("score", "sum", "sum_score"), ("score", "count", "n"),
             ("score", "collect", "scores")]
    kw = dict(specs=specs, keys=("contig", "start", "stop"),
              bin_size=bin_size)

    def norm(df):
        return df.withColumn(
            "scores", F.concat_ws(",", F.col("scores").cast("array<string>"))
        )

    want = _expected(norm(interval_map(ldf_u, rdf, **kw)), uniq, dup)
    got = _multiset(norm(interval_map(ldf_d, rdf, **kw)))
    assert got == want


@pytest.mark.parametrize("bin_size", [16384, 64])
def test_subtract_reemits_per_input_row(spark, dup_frames, bin_size):
    uniq, dup, ldf_u, ldf_d, rdf = dup_frames
    kw = dict(keys=("contig", "start", "stop"), bin_size=bin_size)
    want = Counter()
    mult = Counter(r[3] for r in dup)
    for row, n in _multiset(interval_subtract(ldf_u, rdf, **kw)).items():
        # a unique left row can legitimately split into several segments;
        # each segment repeats per input multiplicity. Output columns are
        # (contig, name, start, stop) — carry columns first.
        want[row] = n * mult[row[1]]
    got = _multiset(interval_subtract(ldf_d, rdf, **kw))
    assert got == want


def test_reserved_dup_columns_rejected(spark, dup_frames):
    _, _, ldf_u, _, rdf = dup_frames
    bad = ldf_u.withColumn("_dupn", F.lit(1))
    with pytest.raises(Exception, match="_dupn"):
        interval_coverage(bad, rdf, keys=("contig", "start", "stop")).collect()
    with pytest.raises(Exception, match="_dupn"):
        interval_closest(bad, rdf, keys=("contig", "start", "stop")).collect()
