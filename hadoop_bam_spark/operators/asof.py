"""As-of (temporal) join: for every left row, the single most recent right
row with the same key and right_time <= left_time (``backward``), or the
earliest with right_time >= left_time (``forward``).

Spark has no native ASOF join; the naive formulation (range join + window)
explodes to every (left, right) pair before ranking. This implementation
uses the union trick instead:

    tag both sides -> union -> one window over (key) ordered by (time, side)
    -> ``last(struct(right cols), ignorenulls=True)`` carries the latest
    right ROW forward to each left row (one struct, so all output attributes
    come from the same matched row) -> keep left rows.

Cost: ONE shuffle of left+right on the key (the window sort), zero row
multiplication, no range predicate. Equal timestamps match (right sorts
before left at the same instant). This is the plan shape that survives
100 TB: state per key is a sort run, skew is bounded by the hottest key
exactly as any keyed window, and AQE handles stragglers.

For a HOT key (one symbol dominating a feed — the case where "bounded
by the hottest key" is the whole job), ``time_chunk`` switches the
carry-forward to the chunked prefix scan (operators/sweep.py): the
``last(ignorenulls)`` becomes a running MAX of ``struct(t, right_row)``
(lexicographic struct order = latest candidate) computed per
(key, time-chunk) with chunk-summary offsets, so one key's events
spread over ``#distinct-chunks`` partitions instead of one.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_right",
    direction: str = "backward",
    time_chunk: int | None = None,
    broadcast_chunk_summary: bool | None = None,
) -> DataFrame:
    """Left as-of join. Unmatched left rows keep nulls (LEFT semantics).

    Output = all left columns + ``right_time + suffix`` (the matched
    timestamp, in its original type) + each of ``right_cols`` renamed with
    ``suffix`` — all taken from the single matched right row.

    ``time_chunk`` (in the resolved integer time unit: microseconds for
    timestamps, days for dates, raw units otherwise) opts into the
    chunked hot-key scan — see the module docstring. Requires ORDERABLE
    right columns (the candidate travels inside a struct max; map-typed
    columns cannot). Results are identical to the default path except
    when several right rows share one (key, timestamp): the default
    keeps an arbitrary sort-stability winner, the chunked form the
    struct-wise largest — both within the operation's tie contract.

    The chunked scan's summary table has one row per (key value, time
    chunk). ``broadcast_chunk_summary=None`` (default, r16) does not
    force a broadcast — AQE sizes the summary join at runtime, so a
    HIGH-cardinality key universe (#keys x #chunks rows) can no longer
    OOM an executor through a forced hint; pass ``True`` only when the
    key universe is known dimension-bounded (the classic hot-key
    scenario: few keys, many chunks).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    from pyspark.sql import types as T

    keys = [on] if isinstance(on, str) else list(on)
    rc = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (*keys, right_time)]
    )

    def time_key(df: DataFrame, col: str) -> F.Column:
        """Monotonic integer sort key; sub-second precision is preserved for
        timestamp columns (a plain long cast truncates to whole seconds)."""
        dt = df.schema[col].dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return F.unix_micros(F.col(col).cast("timestamp"))
        if isinstance(dt, T.DateType):
            return F.datediff(F.col(col), F.lit("1970-01-01")).cast("long")
        return F.col(col).cast("long")

    # The matched right row travels as ONE struct, so every output attribute
    # (including a null one) comes from the SAME most-recent right row —
    # per-column last(ignorenulls) would stitch nulls from older rows into a
    # row that never existed.
    rstruct_type = T.StructType(
        [T.StructField("_rt", right.schema[right_time].dataType)]
        + [T.StructField(f"_v{i}", right.schema[c].dataType)
           for i, c in enumerate(rc)]
    )

    # Time axis: negate for forward so "latest <=" becomes "earliest >=".
    sign = F.lit(1) if direction == "backward" else F.lit(-1)
    l_u = left.select(
        *[F.col(c) for c in left.columns],
        (time_key(left, left_time) * sign).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rstruct_type).alias("_r"),
    )
    r_u = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        (time_key(right, right_time) * sign).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_time).alias("_rt"),
            *[F.col(c).alias(f"_v{i}") for i, c in enumerate(rc)],
        ).alias("_r"),
    )
    u = l_u.unionByName(r_u)
    if time_chunk is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy("_t", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = F.last("_r", ignorenulls=True).over(w)
        src = u
    else:
        from hadoop_bam_spark.operators.sweep import chunked_running_agg

        # Latest candidate == lexicographic max of struct(t, right row)
        # among right-side rows; only rights are candidates so the side
        # never participates in the comparison.
        cand = F.when(
            F.col("_side") == 0,
            F.struct(F.col("_t").alias("t"), F.col("_r").alias("r")),
        )
        # RANGE-frame tie semantics: a left row's running max includes
        # rights at the SAME instant (equal timestamps match, like the
        # default path's rights-before-lefts sort).
        src = chunked_running_agg(
            u,
            keys,
            "_t",
            [(cand, "max", "_best")],
            chunk_size=time_chunk,
            broadcast_summary=broadcast_chunk_summary,
        )
        m = F.col("_best").getField("r")
    matched = src.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        m.getField("_rt").alias(right_time + suffix),
        *[m.getField(f"_v{i}").alias(c + suffix) for i, c in enumerate(rc)],
    )
    return matched.filter(F.col("_side") == 1).drop("_side")
