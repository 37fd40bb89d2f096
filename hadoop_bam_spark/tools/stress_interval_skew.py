"""Single-contig skew stress for the interval algebra (r13 VERDICT #7).

The two-phase range-partitioned sweep (operators/interval_join.py
``_chunked_local_merge``) exists to remove the per-contig window ceiling:
on a one-contig corpus the old single-window form ran its whole sweep in
ONE task regardless of cluster size. This harness proves the fix with
receipts:

- synthesizes two schema-identical interval corpora of N rows over a
  250 Mb axis — one spread across 24 contigs, one entirely on a single
  contig (the worst-case skew shape);
- times interval_merge / interval_cluster / interval_closest /
  interval_multiinter on both (best-of-``reps`` wall, warm JVM), plus
  the OLD single-window merge form inlined here as the baseline the
  fix replaced (closest and multiinter run on the chunked prefix scans
  of operators/sweep.py, so the whole family is covered);
- records the PARTITION COUNT of each operator's sweep stage — non-empty
  partitions under hash(contig, chunk) for the two-phase form vs
  hash(contig) for the old form — the number the per-contig ceiling
  caps at #contigs.

Usage:
    python -m hadoop_bam_spark.tools.stress_interval_skew \
        [--rows=2000000] [--reps=2] [--json=OUT.json]

Exit 1 when the two-phase sweep fails to beat the #contigs ceiling on
the single-contig corpus (its reason to exist).
"""

from __future__ import annotations

import json
import sys
import time

AXIS = 250_000_000  # one human-chromosome-sized axis
N_CONTIGS = 24


def _corpus(spark, rows: int, contigs: int):
    from pyspark.sql import functions as F

    base = spark.range(rows)
    start = (F.col("id") * 9973) % AXIS + 1
    return base.select(
        F.concat(F.lit("chr"), (F.col("id") % contigs).cast("string")).alias(
            "contig"
        ),
        start.cast("long").alias("start"),
        (start + 50 + F.col("id") % 1000).cast("long").alias("stop"),
    )


def _old_merge(df, gap: int = 0):
    """The pre-r14 single-window merge (operators/interval_join.py@r13),
    inlined as the ceiling baseline."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("contig").orderBy("start", "stop")
    prev_max = F.max("stop").over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(
        prev_max.isNull() | (F.col("start") > prev_max + 1 + gap), 1
    ).otherwise(0)
    grp = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.select("contig", "start", "stop")
        .withColumn("_grp", grp)
        .groupBy("contig", "_grp")
        .agg(
            F.min("start").alias("start"),
            F.max("stop").alias("stop"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_grp")
    )


def _sweep_partitions(spark, df, keys) -> int:
    """Non-empty shuffle partitions of the operator's sweep exchange:
    hash(keys) at the session shuffle parallelism — what the window
    stage actually distributes over."""
    from pyspark.sql import functions as F

    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.repartition(n, *[F.col(k) for k in keys])
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )


def main(argv: list[str]) -> int:
    from pyspark.sql import functions as F

    from hadoop_bam_spark.operators.interval_join import (
        MERGE_CHUNK_SIZE,
        interval_closest,
        interval_cluster,
        interval_merge,
        interval_multiinter,
    )
    from hadoop_bam_spark.session import get_spark

    rows, reps, out_json = 2_000_000, 2, None
    for a in argv:
        if a.startswith("--rows="):
            rows = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--json="):
            out_json = a.split("=", 1)[1]

    spark = get_spark("stress_interval_skew")
    shapes = {
        "multi_contig": _corpus(spark, rows, N_CONTIGS).cache(),
        "single_contig": _corpus(spark, rows, 1).cache(),
    }
    for df in shapes.values():
        df.count()

    chunk_col = F.floor((F.col("start") - 1) / MERGE_CHUNK_SIZE).alias("_chunk")

    def timed(fn) -> tuple[float, int]:
        best, n = float("inf"), -1
        for _ in range(reps):
            t0 = time.time()
            n = fn().count()
            best = min(best, time.time() - t0)
        return round(best, 3), n

    report: dict = {
        "rows": rows,
        "reps": reps,
        "axis": AXIS,
        "chunk_size": MERGE_CHUNK_SIZE,
        "shuffle_partitions": int(
            spark.conf.get("spark.sql.shuffle.partitions")
        ),
        "shapes": {},
    }
    ceiling_beaten = True
    for shape, df in shapes.items():
        n_contigs = 1 if shape == "single_contig" else N_CONTIGS
        right = df.select(
            "contig",
            (F.col("start") + 25).alias("start"),
            (F.col("stop") + 25).alias("stop"),
        )
        two_phase_parts = _sweep_partitions(
            spark, df.select("contig", chunk_col), ["contig", "_chunk"]
        )
        old_parts = _sweep_partitions(spark, df.select("contig"), ["contig"])
        merge_s, merge_rows = timed(lambda: interval_merge(df))
        old_s, old_rows = timed(lambda: _old_merge(df))
        cluster_s, cluster_rows = timed(lambda: interval_cluster(df))
        closest_s, closest_rows = timed(lambda: interval_closest(df, right))
        multi_s, multi_rows = timed(
            lambda: interval_multiinter({"a": df, "b": right})
        )
        assert merge_rows == old_rows, (merge_rows, old_rows)
        report["shapes"][shape] = {
            "n_contigs": n_contigs,
            "sweep_partitions_two_phase": two_phase_parts,
            "sweep_partitions_old_window": old_parts,
            "interval_merge_s": merge_s,
            "interval_merge_rows": merge_rows,
            "old_single_window_merge_s": old_s,
            "merge_speedup_vs_old": round(old_s / merge_s, 2),
            "interval_cluster_s": cluster_s,
            "interval_cluster_rows": cluster_rows,
            "interval_closest_s": closest_s,
            "interval_closest_rows": closest_rows,
            "interval_multiinter_s": multi_s,
            "interval_multiinter_rows": multi_rows,
        }
        if shape == "single_contig" and two_phase_parts <= n_contigs:
            ceiling_beaten = False

    report["ceiling_beaten"] = ceiling_beaten
    print(json.dumps(report, indent=1))
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(report, fh, indent=1)
    spark.stop()
    return 0 if ceiling_beaten else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
