"""Salted join: row-identical to the plain join, salt spreads the hot key."""

from pyspark.sql import functions as F

from hadoop_bam_spark.operators.skew import salted_join


def test_salted_join_equals_plain(spark):
    # one pathologically hot key (90% of probe rows)
    probe = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(1000)], ["k", "pid"]
    )
    build = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "orphan")], ["k", "tag"])
    plain = probe.join(build, "k").select("k", "pid", "tag")
    salted = salted_join(probe, build, "k", salt=8).select("k", "pid", "tag")
    key = lambda r: (r.k, r.pid, r.tag)
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    probe = spark.createDataFrame([(1, 10), (9, 11)], ["k", "pid"])
    build = spark.createDataFrame([(1, "x")], ["k", "tag"])
    rows = {
        (r.k, r.pid, r.tag)
        for r in salted_join(probe, build, "k", salt=4, how="left").collect()
    }
    assert rows == {(1, 10, "x"), (9, 11, None)}


def test_salt_spreads_hot_key(spark):
    probe = spark.createDataFrame([(1, i) for i in range(64)], ["k", "pid"])
    n_salts = (
        probe.withColumn(
            "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(8))
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts > 1  # the single hot key occupies multiple salt buckets


def test_salted_join_rejects_build_preserving_how(spark):
    import pytest

    probe = spark.createDataFrame([(1, 10)], ["k", "pid"])
    build = spark.createDataFrame([(1, "x")], ["k", "tag"])
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="probe-preserving"):
            salted_join(probe, build, "k", salt=4, how=how)
    # semi/anti remain accepted
    assert salted_join(probe, build, "k", salt=4, how="left_semi").count() == 1
    assert salted_join(probe, build, "k", salt=4, how="left_anti").count() == 0
