"""Distributed prefix scans over genome coordinates — the chunked
running-aggregate machinery behind the event-sweep operators.

Several operators are per-contig sequential sweeps at heart: a running
sum of coverage deltas (pileup), running per-set counters (multiinter),
a running max/min of neighbor coordinates (closest). Expressed as one
``Window.partitionBy(contig)`` each caps its sweep at #contigs-way
parallelism — the same ceiling the two-phase ``interval_merge``
(operators/interval_join.py ``_chunked_local_merge``) removed for the
merge family. This module is the generic form of that fix for ANY
associative running aggregate:

- phase 1: rows land in the range chunk of their position
  (``floor((pos-1)/chunk_size)``); a window per (partition keys, chunk)
  computes the LOCAL running aggregate — parallelism scales with data;
- phase 2: per-chunk totals (ONE row per non-empty chunk) get an
  exclusive prefix aggregate per partition key over the tiny summary
  table, broadcast back, and combined into the exact global running
  value (sum/max/min are associative, so local ⊕ prefix-of-chunk-totals
  ≡ the single-window result).

Tie handling: extra ``order_cols`` refine the within-chunk order; rows
with equal positions always share a chunk (the chunk is a function of
the position), so cross-chunk combination never sees ties.

The reference has no streaming/sweep machinery at all (Hadoop-BAM stops
at record I/O, BAMInputFormat.java); this generalizes the textbook
parallel-prefix construction to Spark windows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default chunk width — same rationale as interval_join.MERGE_CHUNK_SIZE
SWEEP_CHUNK_SIZE = 8 << 20

_OPS = {"sum", "max", "min"}


def _combine(op: str, loc, off):
    if op == "sum":
        return (
            F.when(loc.isNull(), off)
            .when(off.isNull(), loc)
            .otherwise(loc + off)
        )
    # greatest/least skip nulls (null only when BOTH are)
    return (F.greatest if op == "max" else F.least)(loc, off)


def chunked_running_agg(
    df: DataFrame,
    part_cols: Sequence[str],
    pos_col: str,
    specs: Sequence[tuple],
    order_cols: Sequence[str] = (),
    descending: bool = False,
    chunk_size: int = SWEEP_CHUNK_SIZE,
) -> DataFrame:
    """Add exact running aggregates over (``part_cols`` partitions ordered
    by ``pos_col`` [+ ``order_cols``]) without a per-partition-key window.

    ``specs``: (value_column_or_expr, op, output_name) triples with op in
    sum/max/min; the running value INCLUDES the current row (frame
    unboundedPreceding..0). ``descending=True`` runs the scan from the
    high end (suffix scan) — it flips ONLY the position order;
    ``order_cols`` (names or Column expressions, e.g. ``F.col("t").asc()``)
    refine ties verbatim in either direction. Null values are transparent
    (ignored by the aggregate, like the window form).
    """
    for _, op, _ in specs:
        if op not in _OPS:
            raise ValueError(f"unsupported running op {op!r}")
    part = list(part_cols)
    chunk = F.floor((F.col(pos_col) - 1) / F.lit(chunk_size)).cast("long")
    base = df.withColumn("_swchunk", chunk)
    pos_order = F.col(pos_col).desc() if descending else F.col(pos_col).asc()
    order = [
        pos_order,
        *[F.col(c) if isinstance(c, str) else c for c in order_cols],
    ]
    wl = (
        Window.partitionBy(*part, "_swchunk")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for val, op, out in specs:
        base = base.withColumn(f"_loc_{out}", getattr(F, op)(val).over(wl))
    # chunk totals -> exclusive per-partition prefix over the summary
    # (ONE row per non-empty chunk — the only partition-serial stage,
    # and it is O(#chunks), not O(rows))
    cs = base.groupBy(*part, "_swchunk").agg(
        *[getattr(F, op)(val).alias(f"_tot_{out}") for val, op, out in specs]
    )
    co = F.col("_swchunk").desc() if descending else F.col("_swchunk")
    wc = (
        Window.partitionBy(*part)
        .orderBy(co)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cs = cs.select(
        *part,
        "_swchunk",
        *[
            getattr(F, op)(f"_tot_{out}").over(wc).alias(f"_off_{out}")
            for _, op, out in specs
        ],
    )
    out_df = base.join(F.broadcast(cs), on=[*part, "_swchunk"], how="left")
    for _, op, out in specs:
        out_df = out_df.withColumn(
            out, _combine(op, F.col(f"_loc_{out}"), F.col(f"_off_{out}"))
        )
    return out_df.drop(
        "_swchunk",
        *[f"_loc_{o}" for _, _, o in specs],
        *[f"_off_{o}" for _, _, o in specs],
    )


def chunked_lead_pos(
    df: DataFrame,
    part_cols: Sequence[str],
    pos_col: str,
    out: str = "_next",
    chunk_size: int = SWEEP_CHUNK_SIZE,
) -> DataFrame:
    """Add ``out`` = the next DISTINCT ``pos_col`` per partition (null on
    the last row) without a per-partition-key window. Positions must be
    unique within a partition (every sweep consumer pre-aggregates by
    position first). Within a chunk it is a plain lead; the last row of
    each chunk takes the NEXT non-empty chunk's min position from the
    chunk-summary table (lead over one row per chunk).
    """
    part = list(part_cols)
    chunk = F.floor((F.col(pos_col) - 1) / F.lit(chunk_size)).cast("long")
    base = df.withColumn("_swchunk", chunk)
    wl = Window.partitionBy(*part, "_swchunk").orderBy(pos_col)
    base = base.withColumn("_lead_in", F.lead(pos_col).over(wl))
    cs = base.groupBy(*part, "_swchunk").agg(F.min(pos_col).alias("_cmin"))
    wc = Window.partitionBy(*part).orderBy("_swchunk")
    cs = cs.select(
        *part, "_swchunk", F.lead("_cmin").over(wc).alias("_next_chunk_min")
    )
    return (
        base.join(F.broadcast(cs), on=[*part, "_swchunk"], how="left")
        .withColumn(out, F.coalesce("_lead_in", "_next_chunk_min"))
        .drop("_swchunk", "_lead_in", "_next_chunk_min")
    )
