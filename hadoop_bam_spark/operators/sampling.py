"""Deterministic sampling operators for training-data pipelines.

Sampling a 100 TB corpus must be (a) a single scan with no shuffle, (b)
reproducible across runs, retries, and engines — a task that is retried
must emit the SAME sample or downstream dedup/statistics silently skew.
Spark's ``df.sample`` is seeded per-partition, so repartitioning changes
the sample; these operators hash stable ids instead: membership is a pure
function of the row, independent of partitioning, cluster size, or
execution order.

``hash60`` (md5-derived) is the same hash family the dedup operators use,
so samples are portable across engines (the DuckDB oracles replicate them
bit-for-bit).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from hadoop_bam_spark.operators.dedup import hash60

#: Denominator for rate arithmetic: rates are quantized to basis points so
#: membership tests are exact integer comparisons (no float thresholds).
RATE_DENOM = 10_000


def _bucket(id_col: Column, salt: str) -> Column:
    """Stable bucket in [0, RATE_DENOM) from a row id and a salt.

    The salt decorrelates independent samples drawn from the same corpus
    (two 10% samples with different salts overlap ~1%, not 100%).
    """
    return hash60(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))) % RATE_DENOM


def hash_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose id-hash bucket
    falls below ``rate``. One narrow filter — pushed to the scan, no
    shuffle, reproducible under retries and repartitioning."""
    threshold = int(round(rate * RATE_DENOM))
    return df.filter(_bucket(F.col(id_col), salt) < threshold)


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-rebalancing primitive
    (e.g. downsample English to 10%, keep low-resource languages at 100%).

    The per-stratum threshold is a small CASE expression, so the whole
    operator is still one narrow scan-side filter; no join, no shuffle.
    """
    threshold = F.lit(int(round(default_rate * RATE_DENOM)))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == value, F.lit(int(round(rate * RATE_DENOM)))
        ).otherwise(threshold)
    return df.filter(_bucket(F.col(id_col), salt) < threshold)


#: sub-partition fan-out of the two-phase per-stratum top-n: phase-1
#: ranks within (stratum, hash % FANOUT) — a heavy stratum sorts as
#: FANOUT independent partitions — and phase 2 ranks only the surviving
#: ≤ n×FANOUT candidates per stratum.
TOPN_FANOUT = 32


def _two_phase_top_n(
    df: DataFrame, n: int, stratum_col: str, order, id_col: str,
    fanout: int,
) -> DataFrame:
    """Exact distributed top-n per stratum: every global top-n row is by
    definition within the top n OF ITS SUB-PARTITION, so ranking the
    (stratum, sub) heads and re-ranking the ≤ n×fanout survivors per
    stratum returns exactly the single-window answer — without ever
    sorting a whole stratum in one task."""
    sub = hash60(
        F.concat(F.lit("sub:"), F.col(id_col).cast("string"))
    ) % fanout
    w1 = Window.partitionBy(stratum_col, "_sub").orderBy(*order)
    w2 = Window.partitionBy(stratum_col).orderBy(*order)
    return (
        df.withColumn("_sub", sub)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= n)
        .withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= n)
        .drop("_sub", "_rk1", "_rk")
    )


def top_n_per_stratum(
    df: DataFrame,
    n: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
    fanout: int = TOPN_FANOUT,
) -> DataFrame:
    """Exactly-n uniform-without-replacement sample per stratum.

    Deterministic reservoir equivalent: rank rows inside each stratum by
    their id-hash (a random-but-stable permutation) and keep the first n.

    Scale shape: two-phase exact top-n (:func:`_two_phase_top_n`) — a
    heavy stratum is ranked as ``fanout`` independent sub-partitions
    and only ≤ n×fanout candidates reach the per-stratum window, so no
    single task ever sorts a whole stratum (the pre-r14 form's
    documented skew point)."""
    order = [
        hash60(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))),
        F.col(id_col),
    ]
    return _two_phase_top_n(df, n, stratum_col, order, id_col, fanout)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
    stratum_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis via the exponential race): each row draws a
    stable pseudo-uniform u in (0,1] from (salt, id) and the key
    ``-ln(u) / w`` — an Exponential(w) variate — and the n SMALLEST
    keys are exactly a weight-proportional sample without replacement.
    Because u is an id hash (not RNG state), the sample is reproducible
    across runs, retries, repartitioning, and engines (hash60 is the
    md5 family the DuckDB oracles replicate).

    Scale shape: global mode compiles to Spark's distributed top-n
    (``TakeOrderedAndProject``: per-partition heads, one tiny driver
    merge — no full sort, no single-partition window). Stratified mode
    uses the two-phase exact top-n (:func:`_two_phase_top_n`), so a
    heavy stratum never sorts in one task.

    Rows with NULL or non-positive weight are excluded (weight 0 =
    never sampled; the ES keys require w > 0).
    """
    u = (
        hash60(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")))
        + F.lit(1)
    ) / F.lit(float(1 << 60))
    key = -F.log(u) / F.col(weight_col).cast("double")
    base = df.filter(F.col(weight_col) > 0)
    if stratum_col is None:
        return base.orderBy(key.asc(), F.col(id_col)).limit(n)
    return _two_phase_top_n(
        base, n, stratum_col, [key.asc(), F.col(id_col)], id_col,
        TOPN_FANOUT,
    )
