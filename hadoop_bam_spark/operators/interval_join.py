"""Interval (genomic range) overlap joins.

The reference expresses interval queries as split-level predicate pushdown
into BAI/tabix indexes (BAMInputFormat.java:542-644, VCFInputFormat.java:
388-472) plus a row-level residual filter (VCFRecordReader.java:213-219).
As a *join* between two record sets it has no reference implementation, so we
provide the two canonical Spark strategies:

- ``interval_join_broadcast``: small interval side → broadcast + range
  predicate. Catalyst executes a BroadcastNestedLoopJoin; no shuffle of the
  big side. Right choice when regions fit in executor memory (the common
  `-L intervals` case).

- ``interval_join_binned``: large × large → explode both sides onto
  fixed-size genome tiles (default 16 kb, the BAI linear-index granularity,
  BAMInputFormat.java:357-373), shuffle equi-join on (contig, bin),
  post-filter the exact overlap, and drop bin-induced duplicates by keeping
  only the pair's first shared bin. Scales linearly with data size; the join
  key (contig, bin) is high-cardinality so AQE can split skewed bins.

Overlap convention: closed intervals, 1-based, overlap iff
``a.start <= b.stop AND b.start <= a.stop`` (same as htsjdk Interval).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] = ("contig", "start", "stop"),
    how: str = "inner",
) -> DataFrame:
    """Overlap join with the (small) right side broadcast."""
    lc, ls, le = (F.col(k) for k in left_keys)
    rc, rs, re_ = (F.col(k) for k in right_keys)
    cond = (lc == rc) & (ls <= re_) & (rs <= le)
    return left.join(F.broadcast(right), cond, how)


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str] = ("contig", "start", "stop"),
    right_keys: Sequence[str] = ("contig", "start", "stop"),
    bin_size: int = 16384,
) -> DataFrame:
    """Large-by-large overlap join via genome binning.

    Each row is exploded to every ``bin_size`` tile its interval touches;
    the shuffle join runs on (contig, bin). A pair of overlapping intervals
    shares every bin their intersection touches — to emit it exactly once we
    keep only the bin containing max(left.start, right.start), which both
    sides are guaranteed to have exploded.
    """
    lc, ls, le = left_keys
    rc, rs, re_ = right_keys

    def binned(df: DataFrame, contig: str, start: str, stop: str, side: str) -> DataFrame:
        return df.withColumn(
            f"_bin_{side}",
            F.explode(
                F.sequence(
                    ((F.col(start) - 1) / bin_size).cast("long"),
                    ((F.col(stop) - 1) / bin_size).cast("long"),
                )
            ),
        )

    lb = binned(left, lc, ls, le, "l")
    rb = binned(right, rc, rs, re_, "r")
    joined = lb.join(
        rb,
        (lb[lc] == rb[rc])
        & (lb["_bin_l"] == rb["_bin_r"])
        & (lb[ls] <= rb[re_])
        & (rb[rs] <= lb[le]),
    )
    # Dedup: emit the pair only from the first bin of its intersection.
    first_shared_bin = ((F.greatest(F.col(ls), F.col(rs)) - 1) / bin_size).cast("long")
    return joined.filter(F.col("_bin_l") == first_shared_bin).drop("_bin_l", "_bin_r")


def interval_merge(
    df: DataFrame,
    keys: Sequence[str] = ("contig", "start", "stop"),
    gap: int = 0,
) -> DataFrame:
    """Flatten overlapping (and book-ended) intervals per contig — the
    bedtools-merge operation. Returns one row per merged region:
    ``(contig, start, stop, n_merged)``.

    Two 1-based closed intervals merge when the next one starts at or
    before ``previous max stop + 1 + gap`` (``gap=0`` merges
    overlapping AND adjacent intervals, the bedtools default; a larger
    gap closes small holes, e.g. blocklist smoothing).

    Scale shape: ONE shuffle — a window partitioned by contig ordered
    by (start, stop) computes the running max stop, a new region opens
    where the gap rule breaks, and a second pass over the same
    partitioning (no extra shuffle: the groupBy keys are a superset of
    the window partition key prefix) aggregates each region. Per-contig
    ordering is the inherent sequential dependency of the operation;
    at 100 TB the skew unit is one contig's intervals, the same unit
    every coordinate-sorted genomics tool processes serially — for
    corpus-scale interval sets pre-aggregate identical intervals first.
    """
    from pyspark.sql import Window

    c, s, e = keys
    w = Window.partitionBy(c).orderBy(s, e)
    prev_max = F.max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(
        prev_max.isNull() | (F.col(s) > prev_max + 1 + gap), 1
    ).otherwise(0)
    grp = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.select(c, s, e)
        .withColumn("_grp", grp)
        .groupBy(c, "_grp")
        .agg(
            F.min(s).alias(s),
            F.max(e).alias(e),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_grp")
    )
