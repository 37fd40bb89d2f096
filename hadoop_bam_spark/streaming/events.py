"""Streaming operators over the events table (file-based stream).

Batch/stream parity: ``hourly_rollup_stream`` computes the same result as
the batch ``events_hourly_rollup`` query when run with
``trigger(availableNow=True)`` — the standard way to validate a streaming
pipeline against its batch oracle.

Scale notes: the windowed aggregate is incremental (state = one row per
open window per key, pruned by the watermark); the sessionizer keeps one
small state row per active user and emits sessions on gap timeout — both
survive unbounded input, unlike their batch equivalents which re-shuffle
history every run.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events parquet (one file per micro-batch so
    availableNow replays deterministically).

    The stream source needs a declared schema; probe the batch footer once so
    both ``ts`` physical types the driver has shipped (int64 TIMESTAMP(NANOS)
    under the legacy conf, and native TIMESTAMP(MICROS)) stream correctly."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_ts = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .schema["ts"]
        .dataType
    )
    stream = (
        spark.readStream.schema(_events_schema(batch_ts))
        .option("maxFilesPerTrigger", 1)
        # the file stream source requires a directory: stream the sf dir
        # with a glob pinned to the events table
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if batch_ts.typeName() in ("long", "integer"):
        ts_us = F.expr("CAST(ts DIV 1000 AS LONG)")
    else:
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return stream.withColumn("ts_us", ts_us).withColumn(
        "event_time", F.timestamp_micros(F.col("ts_us"))
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-hour, per-type incremental rollup with late-data watermarking."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_GAP_US = 30 * 60 * 1000 * 1000  # 30-minute session gap


def _sessionize(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Custom stateful operator: emit a session row whenever a user's event
    gap exceeds 30 minutes (applyInPandasWithState — the engine's analog of
    a custom stateful operator, SURVEY.md §2.9)."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, start_us, last_us, n]],
            columns=[f.name for f in _SESSION_SCHEMA.fields],
        )
        return
    ts = sorted(
        int(t) for pdf in pdfs for t in pdf["ts_us"].tolist()
    )
    if not ts:
        return
    out = []
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = ts[0], ts[0], 0
    for t in ts:
        if t - last_us > _GAP_US:
            out.append([user_id, start_us, last_us, n])
            start_us, n = t, 0
        last_us = t
        n += 1
    state.update((start_us, last_us, n))
    # Close idle sessions on EVENT-time, not wall-clock: a processing-time
    # timeout makes trigger(availableNow) schedule empty micro-batches forever
    # waiting for the wall clock, so a drain run never terminates. The
    # event-time timeout fires as the watermark (data-driven) passes
    # last_event + gap, and availableNow terminates once input is exhausted.
    close_at_ms = last_us // 1000 + _GAP_US // 1000
    state.setTimeoutTimestamp(max(close_at_ms, state.getCurrentWatermarkMs() + 1))
    if out:
        yield pd.DataFrame(
            out, columns=[f.name for f in _SESSION_SCHEMA.fields]
        )


def sessionize_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """30-minute-gap sessionization as a custom stateful streaming operator.

    State per user = (start, last, count): O(active users), independent of
    stream length — the property that makes this viable on an unbounded
    100 TB/day event stream where the batch self-join formulation is not.
    Idle sessions are closed by an event-time timeout against the watermark.
    """
    return (
        events.withWatermark("event_time", watermark)
        .select("user_id", "ts_us", "event_time")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_ASOF_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("view_ts", T.LongType()),
        T.StructField("lag_us", T.LongType()),
    ]
)

_ASOF_STATE_SCHEMA = T.StructType([T.StructField("last_view_us", T.LongType())])


def _asof_match(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Streaming as-of: each click emits the user's most recent view at or
    before it. State = ONE long per user (latest view timestamp) — the
    streaming port of the batch union-trick asof (operators/asof.py), with
    the same tie rule: a view at the click's exact instant matches.

    Within a micro-batch events process in event-time order; across batches
    ordering is watermark-bounded exactly like any stateful operator. A view
    arriving after its click's batch cannot retro-match (append semantics).
    """
    (user_id,) = key
    if state.hasTimedOut:  # no timeout configured; defensive
        return
    rows = []
    for pdf in pdfs:
        rows.extend(
            zip(pdf["ts_us"].tolist(), pdf["event_type"].tolist(),
                pdf["event_id"].tolist())
        )
    if not rows:
        return
    # views sort before clicks at the same instant (side 0 < 1), matching
    # the batch operator's equal-timestamp rule
    rows.sort(key=lambda r: (r[0], 0 if r[1] == "view" else 1))
    last_view = state.get[0] if state.exists else None
    out = []
    for ts, etype, eid in rows:
        if etype == "view":
            if last_view is None or ts > last_view:
                last_view = ts
        elif etype == "click":
            out.append([
                eid, user_id, ts, last_view,
                ts - last_view if last_view is not None else None,
            ])
    state.update((last_view,))
    if out:
        yield pd.DataFrame(out, columns=[f.name for f in _ASOF_OUT_SCHEMA.fields])


def asof_join_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Click->most-recent-view as-of join as a custom stateful operator.

    State per user is a single timestamp: O(active users), stream-length
    independent — where the batch formulation re-sorts history per run.
    """
    return (
        events.withWatermark("event_time", watermark)
        .select("event_id", "user_id", "ts_us", "event_type", "event_time")
        .groupBy("user_id")
        .applyInPandasWithState(
            _asof_match,
            outputStructType=_ASOF_OUT_SCHEMA,
            stateStructType=_ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("c", T.LongType()),
        T.StructField("p", T.LongType()),
    ]
)

_FUNNEL_STATE_SCHEMA = _FUNNEL_OUT_SCHEMA


def _funnel_stages(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Ordered-funnel stage tracker: first view, first click at-or-after it,
    first purchase at-or-after that. Emits the user's updated stage row
    whenever a batch advances any stage (a changelog; consumers take the
    latest row per user). Same semantics as the batch events_funnel."""
    (user_id,) = key
    if state.hasTimedOut:
        return
    rows = []
    for pdf in pdfs:
        rows.extend(zip(pdf["ts_us"].tolist(), pdf["event_type"].tolist()))
    if not rows:
        return
    rows.sort()
    existed = state.exists
    if existed:
        _, v, c, p = state.get
    else:
        v = c = p = None
    before = (v, c, p)
    for ts, etype in rows:
        if etype == "view":
            if v is None:
                v = ts
        elif etype == "click":
            if v is not None and c is None and ts >= v:
                c = ts
        elif etype == "purchase":
            if c is not None and p is None and ts >= c:
                p = ts
    state.update((user_id, v, c, p))
    if (v, c, p) != before or not existed:
        yield pd.DataFrame(
            [[user_id, v, c, p]],
            columns=[f.name for f in _FUNNEL_OUT_SCHEMA.fields],
        )


def funnel_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Conversion-funnel stages as a custom stateful operator.

    State per user = three timestamps; each batch appends the user's updated
    stage row. Aggregate latest-per-user downstream for the funnel counts —
    the streaming changelog shape of the batch single-shuffle funnel.
    """
    return (
        events.withWatermark("event_time", watermark)
        .select("user_id", "ts_us", "event_type", "event_time")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_stages,
            outputStructType=_FUNNEL_OUT_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_sec: float = 300.0,
) -> DataFrame:
    """Drain the stream with availableNow into a memory sink and return the
    materialized result (batch/stream parity harness). Bounded: raises if the
    drain does not terminate within ``timeout_sec`` instead of hanging."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"availableNow drain of {query_name!r} still running after "
                f"{timeout_sec}s (non-terminating trigger?)"
            )
    finally:
        q.stop()
    return stream_df.sparkSession.table(query_name)
