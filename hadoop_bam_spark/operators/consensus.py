"""Consensus sequence: apply variants to a reference — the
``bcftools consensus`` operation over the splittable FASTA chunk scan.

The reference scan (``spark.read.format("fasta")``, splittable faidx
chunks of ``(contig, pos, seq)``) joins against a variant table; each
chunk splices its overlapping edits in one JVM-side aggregate
expression and unmodified chunks pass through untouched, so a
whole-genome consensus is a map-side transform over the chunk stream —
no contig ever materializes in one task, no Python ever runs on
executors.

Scopes (``on_indel``):

- ``"drop"`` (default) / ``"error"``: single-base substitutions only
  (``len(ref) == len(alt) == 1``); non-SNP rows — including null-alt
  rows — are dropped or raise. Chunk positions and lengths are
  unchanged, so the output chunk grid equals the input grid.
- ``"apply"`` (r15): full indel support. A variant replaces the
  reference span ``[pos, pos + len(ref) - 1]`` (the VCF convention:
  ``ref`` spells the replaced bases, so deletions/insertions carry
  their anchor base) with ``alt``. Downstream coordinates shift — the
  sequential dependency the SNP scope deferred — re-anchored with a
  length-delta prefix scan: each output chunk's new ``pos`` is 1 + the
  exclusive running sum of prior chunks' OUTPUT lengths per contig
  (operators/sweep.py ``chunked_scan``, so the re-anchoring has no
  per-contig window either). A deletion spanning a chunk boundary is
  clipped per chunk and its ``alt`` inserted only in the chunk owning
  the variant start. Output ``pos`` is therefore a CONSENSUS
  coordinate, and chunks spliced down to zero length are dropped.

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
    order_col: str | None = None,
) -> DataFrame:
    """Return the FASTA chunk rows with the variants applied.

    ``variants`` columns (via ``keys``): contig, 1-based position, ref
    allele, alt allele. The ref allele, when present (non-null), is NOT
    verified against the sequence here (bcftools warns; a verifying
    caller can join the output back).

    Several variants at ONE site: bcftools applies the FIRST record in
    file order and warns on the rest. Pass ``order_col`` — a column
    giving each variant row its input rank (a row index / file offset;
    should be unique per site) — to reproduce that first-wins rule
    (r16, the site dedup becomes a struct MIN keyed on the rank).
    Without ``order_col`` a DataFrame has no row order to be "first"
    in, so the dedup falls back to the documented deterministic
    DEVIATION from bcftools: the (alt, ref-length)-lexicographically
    LARGEST edit wins (real call sets have one row per site, where the
    two rules agree trivially). Null-alt rows are malformed: dropped
    under ``on_indel="drop"``, raised under ``"error"``/``"apply"`` (a
    null alt must never splice — it would NULL the whole chunk sequence
    through the concat).

    ``on_indel="apply"`` additionally requires a spelled (non-null,
    non-empty) ref for any variant whose alt is not a single base, and
    REJECTS overlapping variant spans with a runtime error (bcftools
    refuses overlapping edits too; applying both would be ambiguous).
    See the module docstring for the coordinate contract.

    Scale shape: one binned tile join variant spans x chunk spans via
    the loose outer form FROM the chunk side, so untouched chunks
    survive as-is; per-chunk edits collect into a sorted offset list
    (bounded by the chunk's variant density) and apply in a single
    ``aggregate`` string splice — O(pieces) concat, JVM-side, no UDF.
    ``"apply"`` adds the chunked prefix scan over one row per chunk.
    """
    from hadoop_bam_spark.operators.interval_join import interval_join_binned

    if on_indel not in ("drop", "error", "apply"):
        raise ValueError(f"on_indel must be drop|error|apply, got {on_indel!r}")
    c, p, ref, alt = keys
    # Null-safe SNP predicate: `False AND NULL` is False, so a null alt
    # lands in the non-SNP branch instead of slipping through as NULL
    # (which would silently NULL the spliced sequence).
    snp = (
        F.col(alt).isNotNull()
        & (F.length(F.coalesce(F.col(ref), F.lit("N"))) == 1)
        & (F.length(F.col(alt)) == 1)
    )
    if on_indel == "apply":
        ref_len = (
            F.when(
                F.col(ref).isNotNull() & (F.length(ref) >= 1), F.length(ref)
            )
            .when(snp, F.lit(1))
            .otherwise(
                F.raise_error(
                    F.lit(
                        "fasta_consensus(apply): variant needs a spelled ref "
                        "unless it is a single-base substitution (null alt "
                        "rows are malformed)"
                    )
                )
            )
            .cast("long")
        )
        v = variants.select(
            F.col(c).alias("_vc"),
            F.col(p).cast("long").alias("_vp"),
            F.when(
                F.col(alt).isNull(),
                F.raise_error(
                    F.lit("fasta_consensus(apply): null alt variant row")
                ),
            )
            .otherwise(F.col(alt))
            .alias("_alt"),
            ref_len.alias("_rlen"),
            *([F.col(order_col).alias("_ord")] if order_col else []),
        )
    else:
        v = variants.select(
            F.col(c).alias("_vc"),
            F.col(p).cast("long").alias("_vp"),
            F.col(alt).alias("_alt"),
            snp.alias("_is_snp"),
            *([F.col(order_col).alias("_ord")] if order_col else []),
        )
        if on_indel == "error":
            # Poison the alt column instead of filtering: a filtered
            # row's raise branch is dead code Catalyst prunes, but every
            # row's _alt IS evaluated by the site-dedup aggregate below.
            v = v.withColumn(
                "_alt",
                F.when(
                    ~F.col("_is_snp"),
                    F.raise_error(
                        F.lit(
                            "fasta_consensus: non-SNP (or null-alt) "
                            "variant row"
                        )
                    ),
                ).otherwise(F.col("_alt")),
            )
        else:
            v = v.filter(F.col("_is_snp"))
        v = v.withColumn("_rlen", F.lit(1).cast("long"))
    if order_col:
        # bcftools first-wins: struct MIN keyed on the caller's input
        # rank (still evaluates _alt on every row — the error/apply
        # poisons keep firing)
        site_pick = F.min(
            F.struct(F.col("_ord"), F.col("_alt"), F.col("_rlen"))
        )
    else:
        site_pick = F.max(F.struct("_alt", "_rlen"))
    v = (
        # one edit per site, deterministically; the struct agg evaluates
        # _alt on every row, firing the error/apply poisons
        v.groupBy("_vc", "_vp")
        .agg(site_pick.alias("_e"))
        .select(
            "_vc",
            "_vp",
            F.col("_e._alt").alias("_alt"),
            F.col("_e._rlen").alias("_rlen"),
            (F.col("_vp") + F.col("_e._rlen") - 1).alias("_ve"),
        )
    )
    chunks = fasta.select(
        "contig",
        F.col("pos").cast("long").alias("pos"),
        (F.col("pos").cast("long") + F.length("seq") - 1).alias("_end"),
        "seq",
    )
    hits = interval_join_binned(
        chunks, v, left_keys=("contig", "pos", "_end"),
        right_keys=("_vc", "_vp", "_ve"), bin_size=bin_size,
        how="left_outer_loose",
    )
    # Per-chunk edit: [off, end_off] (0-based, inclusive, clipped to the
    # chunk) replaced by `ins` — the alt only in the chunk owning the
    # variant START (a boundary-spanning deletion's continuation chunks
    # just lose bases).
    sub = F.when(
        F.col("_vc").isNotNull(),
        F.struct(
            (F.greatest(F.col("_vp"), F.col("pos")) - F.col("pos"))
            .cast("int")
            .alias("off"),
            (F.least(F.col("_ve"), F.col("_end")) - F.col("pos"))
            .cast("int")
            .alias("end_off"),
            F.when(F.col("_vp") >= F.col("pos"), F.col("_alt"))
            .otherwise(F.lit(""))
            .alias("ins"),
        ),
    )
    grouped = hits.groupBy("contig", "pos", "_end", "seq").agg(
        F.sort_array(F.collect_list(sub)).alias("_subs")
    )
    # Splice: walk the sorted offsets once, carrying (cursor, acc).
    # A next edit starting before the cursor means overlapping variant
    # spans — ambiguous, rejected (SNP modes cannot reach it: sites are
    # deduped and every span is one base).
    spliced = F.aggregate(
        F.col("_subs"),
        F.struct(
            F.lit(0).alias("cur"), F.lit("").cast("string").alias("acc")
        ),
        lambda a, x: F.struct(
            (x["end_off"] + 1).alias("cur"),
            F.concat(
                a["acc"],
                F.when(
                    x["off"] < a["cur"],
                    F.raise_error(
                        F.lit(
                            "fasta_consensus(apply): overlapping variant "
                            "spans"
                        )
                    ),
                ).otherwise(
                    F.substring(F.col("seq"), a["cur"] + 1, x["off"] - a["cur"])
                ),
                x["ins"],
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"],
            F.substring(
                F.col("seq"), a["cur"] + 1, F.length("seq") - a["cur"]
            ),
        ),
    )
    out = grouped.select(
        "contig",
        "pos",
        F.when(F.size("_subs") > 0, spliced).otherwise(F.col("seq")).alias("seq"),
    )
    if on_indel != "apply":
        return out
    # Re-anchor: new pos = 1 + exclusive prefix sum of output chunk
    # lengths per contig (ordered by the ORIGINAL pos — one row per
    # chunk, strict ascending scan, no per-contig window).
    from hadoop_bam_spark.operators.sweep import chunked_scan

    out = chunked_scan(
        out,
        ["contig"],
        "pos",
        [(F.length("seq").cast("long"), "sum", "_cum", "asc", True)],
    )
    return out.select(
        "contig",
        (F.coalesce(F.col("_cum"), F.lit(0)) + 1).alias("pos"),
        "seq",
    ).filter(F.length("seq") > 0)
