"""Corpus-curation operators beyond the r8 set: Gopher-style repetition
signals, PII detection/redaction, and exact paragraph-level dedup.

These are the remaining standard filters of a large-scale training-data
pipeline (Rae et al. "Scaling Language Models" [Gopher] §A.1.1 repetition
rules; the C4/RefinedWeb PII scrub; paragraph dedup from Lee et al.
"Deduplicating Training Data Makes Language Models Better"). Everything
stays in JVM-side column expressions / aggregations — no Python UDFs —
so Catalyst keeps pushdown and whole-stage codegen, and every operator
has an exact DuckDB oracle.

Scale notes are per operator; the common theme: per-document signals are
map-only (no shuffle), corpus-level dedup aggregates with map-side
partials on content hashes (AQE-splittable), never per-key windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_bam_spark.operators.text import tokens


def repetition_ratios(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repetition signals (Gopher §A.1.1): documents made of
    repeated lines/words are boilerplate or spam and get filtered before
    training.

    Returns (id, n_lines, dup_line_ratio, dup_line_char_ratio,
    top_word_ratio, dup_word_ratio):

    - ``dup_line_ratio``: 1 - distinct_lines / lines (fraction of line
      OCCURRENCES that are repeats of an earlier line);
    - ``dup_line_char_ratio``: same, weighted by characters — catches a
      short unique header over a wall of repeated text;
    - ``top_word_ratio``: occurrences of the single most frequent word /
      total words (Gopher drops docs where one word dominates);
    - ``dup_word_ratio``: 1 - distinct_words / words.

    Map-only: lines and words never leave their document, so this is one
    pass over the text bytes with per-document array expressions — no
    explode, no shuffle beyond the source partitioning. At 100 TB this
    is the cheapest possible shape: Catalyst fuses it into the scan
    stage.
    """
    lines = F.filter(
        F.split(F.col(text_col), r"\n"), lambda ln: F.trim(ln) != ""
    )
    words = F.filter(tokens(F.lower(F.col(text_col))), lambda w: w != "")
    n_lines = F.size(lines)
    n_words = F.size(words)
    distinct_lines = F.size(F.array_distinct(lines))
    distinct_words = F.size(F.array_distinct(words))
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, ln: acc + F.length(ln)
    )
    distinct_line_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("long"),
        lambda acc, ln: acc + F.length(ln),
    )
    # occurrences of the most frequent word, as a pure array expression:
    # sort the words once, then one aggregate pass tracks the longest
    # equal run — O(n log n) per document. (The earlier
    # distinct×filter shape was O(distinct * n): a long document with a
    # large vocabulary went quadratic inside one codegen expression and
    # could dominate the scan stage; r9 ADVICE.)
    zero = F.lit(0).cast("long")
    top_word_n = F.aggregate(
        F.array_sort(words),
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc.prev, acc.run + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc.best,
                F.when(w == acc.prev, acc.run + 1)
                .otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    safe = lambda num, den: F.when(den > 0, F.round(num / den, 6)).otherwise(
        F.lit(0.0)
    )
    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        safe(n_lines - distinct_lines, n_lines).alias("dup_line_ratio"),
        safe(
            line_chars - distinct_line_chars, line_chars
        ).alias("dup_line_char_ratio"),
        safe(top_word_n, n_words).alias("top_word_ratio"),
        safe(n_words - distinct_words, n_words).alias("dup_word_ratio"),
    )


#: RE2-safe patterns (no backrefs/lookahead) so the SAME regex text runs
#: on Spark, DuckDB, and any other engine an oracle might use.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\. ]{7,14}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document PII hit counts per category plus a total — the scan
    half of the standard pre-training scrub (C4/RefinedWeb shape).

    Counting uses ``regexp_count`` per pattern: JVM regex inside
    whole-stage codegen, one pass per pattern over the text. Map-only,
    no shuffle."""
    cols = [F.col(id_col)]
    total = F.lit(0).cast("long")
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        cols.append(c.alias(f"n_{name}"))
        total = total + c
    cols.append(total.alias("n_pii"))
    return df.select(*cols)


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    replacement: str = "[PII]",
) -> DataFrame:
    """Replace every PII match with ``replacement`` and report how many
    substitutions were made per document. Patterns apply in the fixed
    ``PII_PATTERNS`` order (email before phone, so a digit-bearing email
    is consumed as one email, not reparsed as a phone number).

    Map-only chained ``regexp_replace``; the redaction count is the
    pre-count sum (counted BEFORE any replacement so overlapping
    categories count what the scrub actually saw)."""
    out = F.col(text_col)
    total = F.lit(0).cast("long")
    for pat in PII_PATTERNS.values():
        total = total + F.regexp_count(out, F.lit(pat)).cast("long")
        out = F.regexp_replace(out, pat, replacement)
    return df.select(
        F.col(id_col),
        out.alias("text"),
        total.alias("n_redacted"),
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 20,
) -> DataFrame:
    """Exact paragraph-level dedup (Lee et al.): paragraphs (blank-line
    separated, whitespace-normalized, >= ``min_chars``) that occur in
    more than one place keep only their FIRST occurrence (smallest
    (doc, paragraph index)); every other occurrence is marked dropped.

    Returns (doc_id, para_idx, md5, keep) for every qualifying
    paragraph occurrence.

    Plan at 100 TB: explode paragraphs (positions ride along), md5 the
    normalized text, ONE min_by aggregate per hash (map-side partials,
    AQE-splittable — not a per-hash window), broadcast-free shuffle join
    back on the hash to label occurrences. The paragraph text itself
    never shuffles — only 32-byte hashes and (doc, idx) pairs."""
    paras = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), r"\n\s*\n")).alias(
                "para_idx", "_p"
            ),
        )
        .select(
            id_col,
            "para_idx",
            F.regexp_replace(F.trim(F.col("_p")), r"\s+", " ").alias("_norm"),
        )
        .filter(F.length("_norm") >= min_chars)
        .select(
            id_col,
            F.col("para_idx").cast("long").alias("para_idx"),
            F.md5(F.col("_norm")).alias("md5"),
        )
    )
    first = paras.groupBy("md5").agg(
        F.min(F.struct(id_col, "para_idx")).alias("_first")
    )
    return (
        paras.join(first, "md5")
        .select(
            id_col,
            "para_idx",
            "md5",
            (
                (F.col(id_col) == F.col(f"_first.{id_col}"))
                & (F.col("para_idx") == F.col("_first.para_idx"))
            ).alias("keep"),
        )
    )
