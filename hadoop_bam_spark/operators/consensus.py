"""Consensus sequence: apply variants to a reference — the SNP scope of
``bcftools consensus``.

The reference scan (``spark.read.format("fasta")``, splittable faidx
chunks of ``(contig, pos, seq)``) joins against a variant table; each
chunk splices its overlapping substitutions in one JVM-side aggregate
expression and unmodified chunks pass through untouched, so a
whole-genome consensus is a map-side transform over the chunk stream —
no contig ever materializes in one task, no Python ever runs on
executors.

Scope: single-base substitutions (``len(ref) == len(alt) == 1``).
Indels change downstream coordinates — a sequential dependency that
needs a length-delta prefix scan to re-anchor chunk offsets; the SNP
form covers the consensus-for-alignment and masking workflows without
it. Non-SNP rows are dropped (``on_indel="drop"``) or raise
(``"error"``).

The reference (Hadoop-BAM) has no variant application machinery at all;
this composes its FASTA record model (FastaInputFormat.java:334-372,
ReferenceFragment.java:36-41) with the engine's variant layer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fasta_consensus(
    fasta: DataFrame,
    variants: DataFrame,
    keys: Sequence[str] = ("contig", "start", "ref", "alt"),
    on_indel: str = "drop",
    bin_size: int = 16384,
) -> DataFrame:
    """Return the FASTA chunk rows with SNP substitutions applied.

    ``variants`` columns (via ``keys``): contig, 1-based position, ref
    allele, alt allele. The ref allele, when present (non-null), is NOT
    verified against the sequence here (bcftools warns; a verifying
    caller can join the output back). Several variants at one site
    collapse to the lexicographically largest alt (deterministic; real
    call sets have one row per site).

    Scale shape: one binned tile join variants x chunk spans (each SNP
    hits exactly ONE chunk) via the loose outer form FROM the chunk
    side, so untouched chunks survive as-is; per-chunk substitutions
    collect into a sorted offset list (bounded by the chunk's variant
    density) and apply in a single ``aggregate`` string splice —
    O(pieces) concat, JVM-side, no UDF.
    """
    from hadoop_bam_spark.operators.interval_join import interval_join_binned

    if on_indel not in ("drop", "error"):
        raise ValueError(f"on_indel must be drop|error, got {on_indel!r}")
    c, p, ref, alt = keys
    snp = (F.length(F.coalesce(F.col(ref), F.lit("N"))) == 1) & (
        F.length(F.col(alt)) == 1
    )
    v = variants.select(
        F.col(c).alias("_vc"),
        F.col(p).cast("long").alias("_vp"),
        F.col(alt).alias("_alt"),
        snp.alias("_is_snp"),
    )
    if on_indel == "error":
        # Poison the alt column instead of filtering: a filtered row's
        # raise branch is dead code Catalyst prunes, but every row's
        # _alt IS evaluated by the site-dedup aggregate below.
        v = v.withColumn(
            "_alt",
            F.when(
                ~F.col("_is_snp"),
                F.raise_error(F.lit("fasta_consensus: non-SNP variant row")),
            ).otherwise(F.col("_alt")),
        )
    else:
        v = v.filter(F.col("_is_snp"))
    v = (
        # one substitution per site, deterministically
        v.groupBy("_vc", "_vp")
        .agg(F.max("_alt").alias("_alt"))
        .withColumn("_vp2", F.col("_vp"))
    )
    chunks = fasta.select(
        "contig",
        F.col("pos").cast("long").alias("pos"),
        (F.col("pos").cast("long") + F.length("seq") - 1).alias("_end"),
        "seq",
    )
    hits = interval_join_binned(
        chunks, v, left_keys=("contig", "pos", "_end"),
        right_keys=("_vc", "_vp", "_vp2"), bin_size=bin_size,
        how="left_outer_loose",
    )
    sub = F.when(
        F.col("_vc").isNotNull(),
        F.struct(
            (F.col("_vp") - F.col("pos")).cast("int").alias("off"),
            F.col("_alt").alias("alt"),
        ),
    )
    grouped = hits.groupBy("contig", "pos", "_end", "seq").agg(
        F.sort_array(F.collect_list(sub)).alias("_subs")
    )
    # Splice: walk the sorted offsets once, carrying (cursor, acc).
    spliced = F.aggregate(
        F.col("_subs"),
        F.struct(
            F.lit(0).alias("cur"), F.lit("").cast("string").alias("acc")
        ),
        lambda a, x: F.struct(
            (x["off"] + 1).alias("cur"),
            F.concat(
                a["acc"],
                F.substring(
                    F.col("seq"), a["cur"] + 1, x["off"] - a["cur"]
                ),
                x["alt"],
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"],
            F.substring(
                F.col("seq"), a["cur"] + 1, F.length("seq") - a["cur"]
            ),
        ),
    )
    return grouped.select(
        "contig",
        "pos",
        F.when(F.size("_subs") > 0, spliced).otherwise(F.col("seq")).alias("seq"),
    )
