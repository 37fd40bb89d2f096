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
) -> DataFrame:
    """Left as-of join. Unmatched left rows keep nulls (LEFT semantics).

    Output = all left columns + ``right_time + suffix`` (the matched
    timestamp, in its original type) + each of ``right_cols`` renamed with
    ``suffix`` — all taken from the single matched right row.
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
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last("_r", ignorenulls=True).over(w)
    matched = u.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        m.getField("_rt").alias(right_time + suffix),
        *[m.getField(f"_v{i}").alias(c + suffix) for i, c in enumerate(rc)],
    )
    return matched.filter(F.col("_side") == 1).drop("_side")
