"""Streaming document ingestion: the continuous-arrival half of the
training-data pipeline.

A curation pipeline rarely sees its corpus all at once — crawl shards land
continuously. These operators run the SAME column expressions as the batch
operators (quality_score, lang_id, md5 fingerprinting are pure Catalyst
expressions, so they stream unchanged) plus the pieces that genuinely need
streaming semantics:

- ``dedup_exact_stream``: first-seen-wins exact dedup with
  ``dropDuplicatesWithinWatermark`` — state is bounded by the watermark
  horizon instead of growing with all-time corpus size. Cross-horizon
  duplicates are handled by the nightly batch ``dedup_exact`` pass; the
  stream guarantees no duplicates within the horizon, the batch pass
  guarantees global uniqueness — the standard lambda split when the
  all-time fingerprint set cannot fit in streaming state.
- ``quality_filter_stream``: stateless gate (quality score + language
  allowlist) — evaluated per micro-batch with zero state.

Event time is the ingest timestamp; for the deterministic file-based
replays used in tests it is synthesized from ``doc_id``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (one file per
    micro-batch so availableNow replays deterministically), with a
    synthetic monotone ingest time derived from doc_id."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        # base offset keeps every synthetic time strictly above the initial
        # (epoch-0) watermark — an epoch-0 event time is treated as late
        .withColumn(
            "ingest_time",
            F.timestamp_micros(F.col("doc_id") * 1_000_000 + 86_400_000_000),
        )
    )


def dedup_exact_stream(docs: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """First-seen-wins exact dedup over a document stream.

    ``dropDuplicatesWithinWatermark`` keeps one state row per distinct
    fingerprint seen inside the watermark horizon and drops the row when
    the watermark passes — bounded state on an unbounded stream. The
    fingerprint is the same md5 the batch ``dedup_exact`` operator uses,
    so stream + nightly-batch compose into exactly-once corpus membership.
    """
    return (
        docs.withColumn("fingerprint", F.md5(F.col("text")))
        .withWatermark("ingest_time", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def quality_filter_stream(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en", "de", "es", "fr", "zh"),
) -> DataFrame:
    """Stateless quality gate: batch column expressions reused verbatim on
    the stream (quality_score and lang membership are pure Catalyst
    expressions — no state, no shuffle, evaluated inside each micro-batch).
    """
    from hadoop_bam_spark.operators.text import quality_score

    return (
        docs.withColumn("quality", F.round(quality_score(F.col("text")), 6))
        .filter(F.col("quality") >= min_quality)
        .filter(F.col("lang").isin(*langs))
    )
