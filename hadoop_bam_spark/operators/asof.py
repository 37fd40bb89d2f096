"""As-of (temporal) join: for every left row, the single most recent right
row with the same key and right_time <= left_time (``backward``), or the
earliest with right_time >= left_time (``forward``).

Spark has no native ASOF join; the naive formulation (range join + window)
explodes to every (left, right) pair before ranking. This implementation
uses the union trick instead:

    tag both sides -> union -> one window over (key) ordered by (time, side)
    -> ``last(right_attr, ignorenulls=True)`` carries the latest right value
    forward to each left row -> keep left rows.

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
    timestamp) + each of ``right_cols`` renamed with ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rc = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (*keys, right_time)]
    )

    # Time axis: negate for forward so "latest <=" becomes "earliest >=".
    sign = F.lit(1) if direction == "backward" else F.lit(-1)
    l_u = left.select(
        *[F.col(c) for c in left.columns],
        (F.col(left_time).cast("long") * sign).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rt"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in rc
        ],
    )
    r_u = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        (F.col(right_time).cast("long") * sign).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_time).cast("long").alias("_rt"),
        *[F.col(c).alias(f"_r_{c}") for c in rc],
    )
    u = l_u.unionByName(r_u)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        F.last("_rt", ignorenulls=True).over(w).alias(right_time + suffix),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c + suffix)
            for c in rc
        ],
    )
    return matched.filter(F.col("_side") == 1).drop("_side")
