"""Structured Streaming tests: batch/stream parity via availableNow."""

import os
import time

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestEventsStreaming:
    def test_hourly_rollup_matches_batch(self, spark):
        from hadoop_bam_spark.streaming import (
            hourly_rollup_stream,
            read_events_stream,
        )
        from hadoop_bam_spark.streaming.events import run_available_now

        stream = hourly_rollup_stream(read_events_stream(spark, SF))
        got = run_available_now(stream, "t_rollup", "complete")

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = (
            spark.read.parquet(os.path.join(SF, "events.parquet"))
            .withColumn("event_time", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")))
        )
        want = (
            ev.groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("value_sum"))
            .select(F.col("w.start").alias("hour_start"), "event_type", "n", "value_sum")
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_sessionize_stateful(self, spark):
        from hadoop_bam_spark.streaming import read_events_stream, sessionize_stream
        from hadoop_bam_spark.streaming.events import run_available_now

        out = run_available_now(
            sessionize_stream(read_events_stream(spark, SF)), "t_sessions", "append"
        )
        # closed sessions only (open ones wait for the timeout); all emitted
        # sessions must respect the 30-minute gap invariant
        rows = out.collect()
        for r in rows:
            assert r.session_end_us >= r.session_start_us
            assert r.n_events >= 1


class TestFastqStreaming:
    def test_directory_tail(self, spark, tmp_path):
        from hadoop_bam_spark.streaming.fastq_stream import FastqStreamDataSource

        spark.dataSource.register(FastqStreamDataSource)
        land = tmp_path / "landing"
        land.mkdir()
        rec = "@r{i}/1\nACGT\n+\nIIII\n"
        (land / "a.fastq").write_text("".join(rec.format(i=i) for i in range(10)))
        (land / "b.fastq").write_text("".join(rec.format(i=i) for i in range(10, 25)))

        q = (
            spark.readStream.format("fastq_stream")
            .load(str(land))
            .writeStream.format("memory")
            .queryName("t_fastq_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert spark.table("t_fastq_stream").count() == 25
