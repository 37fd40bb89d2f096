"""Sequence packing: assign documents to fixed token-budget training bins.

The deterministic "contiguous fill" strategy: documents are laid out in a
stable order (by id) and a bin boundary falls wherever the running token
total crosses the budget — bin = floor(exclusive_running_total / budget).
This is the order-preserving approximation of greedy first-fit used by
large-scale pretraining pipelines when shuffle-order stability matters more
than perfect fill (each bin over-fills by at most one document, never
splits one).

Scale note: the oracle-checkable form below uses ONE global window (a
single-partition sort) for a deterministic corpus-wide layout — correct but
serial at the margin. At 100 TB you pack per range-partition instead: pass
``by`` to run the same cumsum within each partition key (e.g. a
``repartitionByRange`` bucket id or a date column), which keeps every
window local to its partition and fully parallel; bins are then unique per
(by, bin) pair.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    by: Optional[str] = None,
) -> DataFrame:
    """-> one row per bin: (bin [, by], n_docs, total_tokens, first_id,
    last_id, fill_ratio)."""
    w = (
        Window.partitionBy(by).orderBy(order_col)
        if by is not None
        else Window.orderBy(order_col)
    )
    run = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = df.withColumn(
        "bin", F.floor((run - F.col(token_col)) / F.lit(budget))
    )
    keys = ["bin"] if by is None else [by, "bin"]
    return (
        binned.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).cast("long").alias("total_tokens"),
            F.min(order_col).alias("first_id"),
            F.max(order_col).alias("last_id"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("total_tokens") / F.lit(budget), 4),
        )
    )
