"""Genomics-semantics queries over the synthetic tables.

The driver's correctness gate runs on the TPC-H-ish parquet tables, so each
reference operator's SEMANTICS are exercised on deterministic derived views:

- ``reads``   (from lineitem): qname/flag/ref_idx/pos/end/mapq — models the
  SAM/BAM record family (SURVEY.md §1.1; reference SAMRecordWritable,
  src/main/java/org/seqdoop/hadoop_bam/SAMRecordWritable.java:46-75).
- ``regions`` (from nation): genomic intervals — models the ``-L`` interval
  predicate (reference util/IntervalUtil.java:27-53).

The real file-format layer (BGZF/BAM/SAM/VCF parsing) is exercised by the
pytest suite on actual files; these queries pin down the *operator semantics*
(coordinate key encoding, overlap joins, flagstat, quality re-encode, id
parsing) against a DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_bam_spark.queries.registry import query
from hadoop_bam_spark.session import local_df
from hadoop_bam_spark.operators.interval_join import interval_join_binned as _binned_join

# ---------------------------------------------------------------------------
# Derived deterministic views (identical arithmetic on both engines)
# ---------------------------------------------------------------------------

# SQL CTE for the oracle side.
READS_CTE = """
reads AS (
    SELECT 'r' || l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR AS qname,
           CASE WHEN l_partkey % 19 = 0 THEN -1 ELSE l_suppkey % 4 END AS ref_idx,
           CASE WHEN l_partkey % 19 = 0 THEN 0
                ELSE (l_orderkey * 7 + l_linenumber * 13) % 1000000 + 1 END AS pos,
           50 + (l_orderkey % 3) * 25 AS read_len,
           CASE WHEN l_partkey % 19 = 0 THEN 0
                ELSE (l_orderkey * 7 + l_linenumber * 13) % 1000000
                     + 50 + (l_orderkey % 3) * 25 END AS stop,
           (1 + CASE WHEN l_partkey % 19 = 0 THEN 4 ELSE 0 END
              + (l_orderkey % 2) * 16
              + (l_linenumber % 2) * 64
              + (1 - l_linenumber % 2) * 128)::BIGINT AS flag,
           CASE WHEN l_partkey % 19 = 0 THEN 0
                ELSE (l_orderkey * l_linenumber) % 61 END AS mapq,
           l_orderkey, l_linenumber
    FROM lineitem
)
"""

REGIONS_CTE = """
regions AS (
    SELECT n_nationkey AS region_id,
           n_nationkey % 4 AS contig_idx,
           (n_nationkey * 37561) % 900000 + 1 AS r_start,
           (n_nationkey * 37561) % 900000 + 1 + 25000 + (n_nationkey % 5) * 10000 AS r_stop
    FROM nation
)
"""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def reads_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived aligned-reads table; mirrors READS_CTE exactly."""
    li = _t(spark, sf_dir, "lineitem")
    unmapped = F.col("l_partkey") % 19 == 0
    pos = (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 1000000 + 1
    read_len = 50 + (F.col("l_orderkey") % 3) * 25
    return li.select(
        F.concat(
            F.lit("r"),
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        ).alias("qname"),
        F.when(unmapped, F.lit(-1).cast("long"))
        .otherwise(F.col("l_suppkey") % 4)
        .alias("ref_idx"),
        F.when(unmapped, F.lit(0).cast("long")).otherwise(pos).alias("pos"),
        read_len.alias("read_len"),
        F.when(unmapped, F.lit(0).cast("long"))
        .otherwise(pos + read_len - 1)
        .alias("stop"),
        (
            F.lit(1)
            + F.when(unmapped, 4).otherwise(0)
            + (F.col("l_orderkey") % 2) * 16
            + (F.col("l_linenumber") % 2) * 64
            + (1 - F.col("l_linenumber") % 2) * 128
        )
        .cast("long")
        .alias("flag"),
        F.when(unmapped, F.lit(0).cast("long"))
        .otherwise((F.col("l_orderkey") * F.col("l_linenumber")) % 61)
        .alias("mapq"),
        "l_orderkey",
        "l_linenumber",
    )


def regions_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived interval table; mirrors REGIONS_CTE exactly."""
    nation = _t(spark, sf_dir, "nation")
    start = (F.col("n_nationkey") * 37561) % 900000 + 1
    return nation.select(
        F.col("n_nationkey").cast("long").alias("region_id"),
        (F.col("n_nationkey") % 4).cast("long").alias("contig_idx"),
        start.cast("long").alias("r_start"),
        (start + 25000 + (F.col("n_nationkey") % 5) * 10000).cast("long").alias("r_stop"),
    )


# ---------------------------------------------------------------------------
# Coordinate key encoding + global sort
# ---------------------------------------------------------------------------

@query(
    "coordinate_key_sort",
    oracle=f"""
        WITH {READS_CTE}
        SELECT qname,
               CASE WHEN ref_idx < 0
                    THEN 2147483647 * 4294967296
                         + (l_orderkey * 2654435761) % 4294967296
                    ELSE ref_idx * 4294967296 + (pos - 1) END AS coord_key
        FROM reads
        ORDER BY coord_key, qname
        LIMIT 500
    """,
    doc="64-bit coordinate key: refIdx<<32 | 0-based pos; unmapped reads get "
    "refIdx=Integer.MAX_VALUE plus a deterministic spread hash so they sort "
    "last but distribute across partitions. Port of the key convention in "
    "reference BAMRecordReader.java:80-120 (MurmurHash3 replaced by a "
    "Knuth multiplicative hash as the deterministic salt).",
)
def coordinate_key_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = reads_view(spark, sf_dir)
    coord_key = F.when(
        F.col("ref_idx") < 0,
        F.lit(2147483647 * 4294967296) + (F.col("l_orderkey") * 2654435761) % 4294967296,
    ).otherwise(F.col("ref_idx") * F.lit(4294967296) + (F.col("pos") - 1))
    return (
        reads.select("qname", coord_key.alias("coord_key"))
        .orderBy("coord_key", "qname")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# Interval overlap joins (the reference's -L predicate, as real joins)
# ---------------------------------------------------------------------------

_INTERVAL_ORACLE = f"""
    WITH {READS_CTE}, {REGIONS_CTE}
    SELECT r.region_id, count(*) AS n_reads, sum(reads.mapq)::BIGINT AS sum_mapq
    FROM reads, regions r
    WHERE reads.ref_idx >= 0
      AND reads.ref_idx = r.contig_idx
      AND reads.pos <= r.r_stop AND r.r_start <= reads.stop
    GROUP BY r.region_id
"""


@query(
    "interval_join_broadcast",
    oracle=_INTERVAL_ORACLE,
    doc="Interval overlap join, small region side broadcast + range predicate "
    "(BroadcastNestedLoopJoin). Spark-native equivalent of the reference's "
    "interval pushdown (BAMInputFormat.java:542-644) when the region list "
    "fits in memory.",
    bench=True,
)
def interval_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = reads_view(spark, sf_dir).filter(F.col("ref_idx") >= 0)
    regions = regions_view(spark, sf_dir)
    joined = reads.join(
        F.broadcast(regions),
        (reads.ref_idx == regions.contig_idx)
        & (reads.pos <= regions.r_stop)
        & (regions.r_start <= reads.stop),
    )
    return joined.groupBy("region_id").agg(
        F.count(F.lit(1)).alias("n_reads"), F.sum("mapq").alias("sum_mapq")
    )


@query(
    "interval_join_binned",
    oracle=_INTERVAL_ORACLE,
    doc="Same overlap semantics via the scalable binned decomposition: explode "
    "both sides to 16 kb genome tiles (mirroring the BAI linear-index "
    "granularity, reference BAMInputFormat.java:357-373), equi-join on "
    "(contig, bin), post-filter exact overlap, dedup. This is the "
    "large-by-large path where a broadcast is impossible.",
    bench=True,
)
def interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = reads_view(spark, sf_dir).filter(F.col("ref_idx") >= 0)
    regions = regions_view(spark, sf_dir)
    joined = interval_join_binned_pairs(reads, regions)
    return joined.groupBy("region_id").agg(
        F.count(F.lit(1)).alias("n_reads"), F.sum("mapq").alias("sum_mapq")
    )


def interval_join_binned_pairs(reads: DataFrame, regions: DataFrame) -> DataFrame:
    return _binned_join(
        reads,
        regions,
        left_keys=("ref_idx", "pos", "stop"),
        right_keys=("contig_idx", "r_start", "r_stop"),
        bin_size=16384,
    )


# ---------------------------------------------------------------------------
# Flagstat (SAM bitflag conditional aggregation)
# ---------------------------------------------------------------------------

@query(
    "flagstat",
    oracle=f"""
        WITH {READS_CTE}
        SELECT count(*) AS total,
               sum(CASE WHEN flag & 1 <> 0 THEN 1 ELSE 0 END)::BIGINT AS paired,
               sum(CASE WHEN flag & 4 = 0 THEN 1 ELSE 0 END)::BIGINT AS mapped,
               sum(CASE WHEN flag & 16 <> 0 THEN 1 ELSE 0 END)::BIGINT AS reverse_strand,
               sum(CASE WHEN flag & 64 <> 0 THEN 1 ELSE 0 END)::BIGINT AS first_in_pair,
               sum(CASE WHEN flag & 128 <> 0 THEN 1 ELSE 0 END)::BIGINT AS second_in_pair,
               sum(CASE WHEN flag & 4 = 0 THEN mapq ELSE 0 END)::BIGINT AS sum_mapq_mapped
        FROM reads
    """,
    doc="samtools-flagstat-style conditional counts over SAM bitflags "
    "(flag semantics per SURVEY.md §1.3); single-pass sum(when(...)).",
)
def flagstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = reads_view(spark, sf_dir)
    flag = F.col("flag")

    def has(bit: int):
        return F.when(flag.bitwiseAND(F.lit(bit)) != 0, 1).otherwise(0)

    return reads.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(has(1)).alias("paired"),
        F.sum(F.when(flag.bitwiseAND(F.lit(4)) == 0, 1).otherwise(0)).alias("mapped"),
        F.sum(has(16)).alias("reverse_strand"),
        F.sum(has(64)).alias("first_in_pair"),
        F.sum(has(128)).alias("second_in_pair"),
        F.sum(
            F.when(flag.bitwiseAND(F.lit(4)) == 0, F.col("mapq")).otherwise(0)
        ).alias("sum_mapq_mapped"),
    )


# ---------------------------------------------------------------------------
# Coverage histogram (depth per genome bin)
# ---------------------------------------------------------------------------

@query(
    "coverage_histogram",
    oracle=f"""
        WITH {READS_CTE}
        SELECT ref_idx, bin, count(*) AS depth
        FROM (
            SELECT ref_idx, unnest(generate_series((pos - 1) // 1000,
                                                   (stop - 1) // 1000)) AS bin
            FROM reads WHERE ref_idx >= 0
        )
        GROUP BY ref_idx, bin
    """,
    doc="Per-1kb-bin read depth: explode each read to the bins it overlaps, "
    "count per (contig, bin). The Spark-native form of a coverage track.",
    bench=True,
)
def coverage_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = reads_view(spark, sf_dir).filter(F.col("ref_idx") >= 0)
    return (
        reads.select(
            "ref_idx",
            F.explode(
                F.sequence(
                    ((F.col("pos") - 1) / 1000).cast("long"),
                    ((F.col("stop") - 1) / 1000).cast("long"),
                )
            ).alias("bin"),
        )
        .groupBy("ref_idx", "bin")
        .agg(F.count(F.lit(1)).alias("depth"))
    )


# ---------------------------------------------------------------------------
# Scalar function family (quality re-encode, id parse, base normalize)
# ---------------------------------------------------------------------------

# 16-char alphabets: Illumina Phred+64 charset slice and its Sanger Phred+33
# counterpart (shift by -31). Chosen to avoid quote/backslash in SQL literals.
_HEX = "0123456789abcdef"
_ILL16 = "GHIJKLMNOPQRSTUV"  # chr(71)..chr(86)
_SANGER16 = "()*+,-./01234567"  # chr(40)..chr(55)


@query(
    "quality_recode",
    oracle=f"""
        SELECT doc_id,
               translate(md5(text), '{_HEX}', '{_ILL16}') AS qual_illumina,
               translate(translate(md5(text), '{_HEX}', '{_ILL16}'),
                         '{_ILL16}', '{_SANGER16}') AS qual_sanger
        FROM documents
    """,
    doc="Illumina Phred+64 → Sanger Phred+33 quality re-encoding as a pure "
    "translate() over the charset (JVM-side, codegen). Port of reference "
    "SequencedFragment.convertQuality (SequencedFragment.java:229-268).",
)
def quality_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.functions import phred64_to_phred33

    docs = _t(spark, sf_dir, "documents")
    qual_ill = F.translate(F.md5(F.col("text")), _HEX, _ILL16)
    return docs.select(
        "doc_id",
        qual_ill.alias("qual_illumina"),
        phred64_to_phred33(qual_ill).alias("qual_sanger"),
    )


@query(
    "illumina_id_parse",
    oracle="""
        WITH named AS (
            SELECT event_id,
                   'EAS139:7:FC706VJ:' || (user_id % 8 + 1)::VARCHAR
                   || ':' || (event_id % 2048 + 1)::VARCHAR
                   || ':' || ((event_id * 17) % 20000)::VARCHAR
                   || ':' || ((event_id * 23) % 20000)::VARCHAR
                   || '/' || (event_id % 2 + 1)::VARCHAR AS read_name
            FROM events
        )
        SELECT event_id,
               regexp_extract(read_name, '^([^:]+):', 1) AS instrument,
               CAST(regexp_extract(read_name, '^[^:]+:([0-9]+):', 1) AS BIGINT) AS run_number,
               regexp_extract(read_name, '^[^:]+:[0-9]+:([^:]+):', 1) AS flowcell_id,
               CAST(regexp_extract(read_name, ':([0-9]+):[0-9]+:[0-9]+:[0-9]+/', 1) AS BIGINT) AS lane,
               CAST(regexp_extract(read_name, ':([0-9]+):[0-9]+:[0-9]+/', 1) AS BIGINT) AS tile,
               CAST(regexp_extract(read_name, ':([0-9]+):[0-9]+/', 1) AS BIGINT) AS xpos,
               CAST(regexp_extract(read_name, ':([0-9]+)/', 1) AS BIGINT) AS ypos,
               CAST(regexp_extract(read_name, '/([0-9])$', 1) AS BIGINT) AS read_num
        FROM named
    """,
    doc="Illumina read-id parse (instrument:run:flowcell:lane:tile:x:y/read) "
    "via regexp_extract. Port of the reference's id regex + /N suffix parse "
    "(FastqInputFormat.java:93,349-381).",
)
def illumina_id_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.functions import parse_illumina_id
    from hadoop_bam_spark.queries.relational import load_events

    ev = load_events(spark, sf_dir)
    name = F.concat(
        F.lit("EAS139:7:FC706VJ:"),
        (F.col("user_id") % 8 + 1).cast("string"),
        F.lit(":"),
        (F.col("event_id") % 2048 + 1).cast("string"),
        F.lit(":"),
        ((F.col("event_id") * 17) % 20000).cast("string"),
        F.lit(":"),
        ((F.col("event_id") * 23) % 20000).cast("string"),
        F.lit("/"),
        (F.col("event_id") % 2 + 1).cast("string"),
    )
    named = ev.select("event_id", name.alias("read_name"))
    return named.select("event_id", *parse_illumina_id(F.col("read_name")))


@query(
    "base_normalize",
    oracle=f"""
        SELECT doc_id,
               translate(translate(md5(text), '{_HEX}', 'ACGT.ACGTNACGT.N'),
                         '.', 'N') AS seq_norm
        FROM documents
    """,
    doc="QSEQ '.'-for-no-call base normalization to 'N' "
    "(reference QseqInputFormat.java:403-409) as translate().",
)
def base_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.functions import normalize_bases

    docs = _t(spark, sf_dir, "documents")
    seq_raw = F.translate(F.md5(F.col("text")), _HEX, "ACGT.ACGTNACGT.N")
    return docs.select("doc_id", normalize_bases(seq_raw).alias("seq_norm"))


# ---------------------------------------------------------------------------
# SAM line round-trip (format → parse → aggregate), in-gate parser check
# ---------------------------------------------------------------------------

@query(
    "sam_line_roundtrip",
    oracle=f"""
        WITH {READS_CTE}
        SELECT CASE WHEN ref_idx < 0 THEN NULL
                    ELSE 'chr' || (ref_idx + 1)::VARCHAR END AS rname,
               count(*) AS n, sum(pos)::BIGINT AS sum_pos, sum(flag)::BIGINT AS sum_flag
        FROM reads
        GROUP BY 1
    """,
    doc="Round-trip through the SAM text codec inside the gate: format derived "
    "reads as SAM lines (concat_ws tab), re-parse with the engine's line "
    "parser (split + typed casts — reference SAMRecordReader.java:67-147), "
    "aggregate. Oracle aggregates the pre-format values directly, so any "
    "format/parse asymmetry fails the hash.",
)
def sam_line_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.formats.sam import sam_line_expr, parse_sam_line_cols

    reads = reads_view(spark, sf_dir)
    rname = F.when(F.col("ref_idx") < 0, F.lit("*")).otherwise(
        F.concat(F.lit("chr"), (F.col("ref_idx") + 1).cast("string"))
    )
    lines = reads.select(
        sam_line_expr(
            qname=F.col("qname"),
            flag=F.col("flag"),
            rname=rname,
            pos=F.col("pos"),
            mapq=F.col("mapq"),
        ).alias("line")
    )
    parsed = lines.select(parse_sam_line_cols(F.col("line"))).select("r.*")
    return parsed.groupBy("rname").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").alias("sum_pos"),
        F.sum("flag").alias("sum_flag"),
    )


# ---------------------------------------------------------------------------
# Typed INFO-attribute access (VariantContext attribute map semantics)
# ---------------------------------------------------------------------------

@query(
    "info_typed_access",
    oracle="""
        SELECT event_type,
               sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
               count(*) AS n
        FROM events
        GROUP BY event_type
    """,
    doc="Typed access into a semi-structured attribute map — the DataFrame "
    "analog of the reference's typed INFO codec "
    "(VariantContextCodec.java:267-335): string map + cast at use site.",
)
def info_typed_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.queries.relational import load_events

    ev = load_events(spark, sf_dir)
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Duplicate marking (the classic coordinate-sorted window workload)
# ---------------------------------------------------------------------------

@query(
    "mark_duplicates",
    oracle=f"""
        WITH {READS_CTE},
        ranked AS (
            SELECT ref_idx, pos, flag & 16 AS strand, mapq, qname,
                   row_number() OVER (
                       PARTITION BY ref_idx, pos, flag & 16
                       ORDER BY mapq DESC, qname ASC) AS rk
            FROM reads WHERE flag & 4 = 0
        )
        SELECT ref_idx,
               count(*) AS n_reads,
               sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup,
               count(DISTINCT pos) AS n_sites
        FROM ranked GROUP BY ref_idx
    """,
    doc="Duplicate marking (Picard MarkDuplicates semantics on the model "
    "the reference's coordinate sort exists to serve, "
    "BAMRecordReader.java:80-120): reads sharing (ref, pos, strand) are "
    "duplicates; the highest-quality read survives, deterministic qname "
    "tie-break. One window over the natural high-cardinality key — "
    "hash-partitioned, no skew beyond real pileups, scales with AQE skew "
    "handling.",
    bench=True,
)
def mark_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    reads = reads_view(spark, sf_dir).filter(F.col("flag").bitwiseAND(4) == 0)
    strand = F.col("flag").bitwiseAND(16)
    w = W.partitionBy("ref_idx", "pos", strand).orderBy(
        F.desc("mapq"), F.asc("qname")
    )
    ranked = reads.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("ref_idx").agg(
        F.count(F.lit(1)).alias("n_reads"),
        F.sum(F.when(F.col("rk") > 1, 1).otherwise(0)).alias("n_dup"),
        F.count_distinct("pos").alias("n_sites"),
    )


# ---------------------------------------------------------------------------
# bedtools-family interval operators (subtract / complement / closest /
# coverage / jaccard) — operators/interval_join.py. The reference exposes
# interval semantics only as the -L pushdown predicate
# (BAMInputFormat.java:542-644); these are the full interval-algebra suite a
# user of that predicate reaches for next, expressed as the documented
# one/two-shuffle Spark plans. Each oracle derives the same answer by a
# DIFFERENT construction (closed-form segment counting, all-pairs min,
# single-axis window merges) so a plan bug cannot cancel out.
# ---------------------------------------------------------------------------

# 2^34 folds (contig_idx, pos) onto one numeric axis: positions stay below
# ~1.07e6 (< 2^34), so cross-contig intervals can never touch. Single
# UNPARTITIONED windows sidestep DuckDB's VARCHAR-partitioned ROWS-frame
# bug (see bed_interval_merge) and keep the oracle engine-simple.
_AXIS = 17179869184

_MERGED_REGIONS_CTE = f"""
raxis AS (
    SELECT contig_idx,
           contig_idx * {_AXIS} + r_start AS s2,
           contig_idx * {_AXIS} + r_stop AS e2,
           region_id
    FROM regions
), rflag AS (
    SELECT contig_idx, s2, e2,
           CASE WHEN max(e2) OVER (ORDER BY s2, e2, region_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                 OR s2 > max(e2) OVER (ORDER BY s2, e2, region_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                THEN 1 ELSE 0 END AS opens
    FROM raxis
), rgrp AS (
    SELECT contig_idx, s2, e2,
           sum(opens) OVER (ORDER BY s2, e2
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS grp
    FROM rflag
), mregions AS (
    SELECT min(contig_idx) AS contig_idx,
           min(s2) - min(contig_idx) * {_AXIS} AS m_start,
           max(e2) - min(contig_idx) * {_AXIS} AS m_stop
    FROM rgrp GROUP BY grp
)
"""

_MERGED_READS_CTE = f"""
caxis AS (
    SELECT ref_idx,
           ref_idx * {_AXIS} + pos AS s2,
           ref_idx * {_AXIS} + stop AS e2,
           qname
    FROM reads WHERE flag & 4 = 0
), cflag AS (
    SELECT ref_idx, s2, e2,
           CASE WHEN max(e2) OVER (ORDER BY s2, e2, qname
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                 OR s2 > max(e2) OVER (ORDER BY s2, e2, qname
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                THEN 1 ELSE 0 END AS opens
    FROM caxis
), cgrp AS (
    SELECT ref_idx, s2, e2,
           sum(opens) OVER (ORDER BY s2, e2
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS grp
    FROM cflag
), mreads AS (
    SELECT min(ref_idx) AS ref_idx, min(s2) AS ms2, max(e2) AS me2
    FROM cgrp GROUP BY grp
)
"""


# The synthetic lineitem does NOT enforce the (orderkey, linenumber) PK, so
# derived qnames collide; the interval operators require unique left tuples
# (they regroup on the whole row). Both engines therefore run on DISTINCT
# read tuples — (qname, ref_idx) is unique afterwards because pos/stop are
# functions of qname.
_DISTINCT_READS_CTE = """
dreads AS (
    SELECT DISTINCT qname, ref_idx, pos, stop
    FROM reads WHERE flag & 4 = 0
)
"""


def _mapped_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        reads_view(spark, sf_dir)
        .filter(F.col("flag").bitwiseAND(4) == 0)
        .select("qname", "ref_idx", "pos", "stop")
        .distinct()
    )


@query(
    "interval_subtract_reads",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_DISTINCT_READS_CTE},
        {_MERGED_REGIONS_CTE.lstrip()},
        ov AS (
            SELECT r.qname, r.ref_idx, r.pos, r.stop,
                   count(*) AS k,
                   sum(least(m.m_stop, r.stop) - greatest(m.m_start, r.pos)
                       + 1) AS covered,
                   max(CASE WHEN m.m_start <= r.pos THEN 1 ELSE 0 END) AS cs,
                   max(CASE WHEN m.m_stop >= r.stop THEN 1 ELSE 0 END) AS ce
            FROM dreads r JOIN mregions m
              ON r.ref_idx = m.contig_idx
             AND r.pos <= m.m_stop AND m.m_start <= r.stop
            GROUP BY r.qname, r.ref_idx, r.pos, r.stop
        ),
        per AS (
            SELECT r.ref_idx,
                   COALESCE(o.k + 1 - o.cs - o.ce, 1) AS n_segs,
                   (r.stop - r.pos + 1) - COALESCE(o.covered, 0) AS rem
            FROM dreads r LEFT JOIN ov o
              ON r.qname = o.qname AND r.ref_idx = o.ref_idx
        )
        SELECT ref_idx,
               sum(n_segs)::BIGINT AS n_segments,
               sum(rem)::BIGINT AS remaining_bases,
               sum(CASE WHEN n_segs > 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_surviving_reads
        FROM per GROUP BY ref_idx
    """,
    doc="bedtools subtract at read scale: every region blanked out of every "
    "overlapping read, reads splitting into surviving sub-segments "
    "(operators/interval_join.py interval_subtract: merge regions once, "
    "binned 16 kb-tile join, per-read sentinel walk in pure array "
    "expressions — two shuffles total, payload columns never explode). The "
    "oracle never builds segments: it counts them in closed form "
    "(k+1-covers_start-covers_end over DISJOINT merged regions) and derives "
    "remaining bases as length minus clipped coverage, so a dedup or "
    "sentinel bug in the plan cannot reproduce in the oracle.",
)
def interval_subtract_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_subtract

    reads = _mapped_reads(spark, sf_dir)
    regions = regions_view(spark, sf_dir).select("contig_idx", "r_start", "r_stop")
    segs = interval_subtract(
        reads, regions,
        keys=("ref_idx", "pos", "stop"),
        right_keys=("contig_idx", "r_start", "r_stop"),
    )
    agg = segs.groupBy("ref_idx").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("stop") - F.col("pos") + 1).alias("remaining_bases"),
        F.count_distinct("qname").alias("n_surviving_reads"),
    )
    # The oracle groups over READS (left join), so a contig whose mapped
    # reads are all fully covered still yields a zero row; the segment
    # aggregate alone would drop that group (surfaced at sf0.001 where
    # contig 0's merged regions cover every read).
    contigs = reads.select("ref_idx").distinct()
    return contigs.join(agg, "ref_idx", "left").select(
        "ref_idx",
        F.coalesce("n_segments", F.lit(0).cast("long")).alias("n_segments"),
        F.coalesce("remaining_bases", F.lit(0).cast("long")).alias("remaining_bases"),
        F.coalesce("n_surviving_reads", F.lit(0).cast("long")).alias("n_surviving_reads"),
    )


@query(
    "interval_complement_regions",
    oracle=f"""
        WITH {REGIONS_CTE}, {_MERGED_REGIONS_CTE},
        sizes AS (
            SELECT * FROM (VALUES (0, 1100000), (1, 1100000),
                                  (2, 1100000), (3, 1100000))
                AS t(contig_idx, size)
        ),
        gaps AS (
            SELECT contig_idx,
                   COALESCE(lag(m_stop) OVER (PARTITION BY contig_idx
                                              ORDER BY m_start), 0) + 1
                       AS g_start,
                   m_start - 1 AS g_stop
            FROM mregions
        ),
        tails AS (
            SELECT s.contig_idx,
                   COALESCE(mx.maxstop, 0) + 1 AS g_start,
                   s.size AS g_stop
            FROM sizes s LEFT JOIN (
                SELECT contig_idx, max(m_stop) AS maxstop
                FROM mregions GROUP BY contig_idx
            ) mx USING (contig_idx)
        )
        SELECT contig_idx::BIGINT AS contig_idx,
               g_start::BIGINT AS gap_start, g_stop::BIGINT AS gap_stop
        FROM (SELECT * FROM gaps UNION ALL SELECT * FROM tails)
        WHERE g_start <= g_stop
    """,
    doc="bedtools complement: the genome NOT covered by any region, against "
    "a contig-sizes table (the .fai analog). interval_complement = one "
    "interval_merge + a lag window over the (tiny) merged set + a broadcast "
    "sizes join; contigs with no regions yield one full-length gap. The "
    "oracle rebuilds the gaps from the single-axis merged CTE with an "
    "independent lag/tail construction.",
)
def interval_complement_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_complement

    regions = regions_view(spark, sf_dir).select("contig_idx", "r_start", "r_stop")
    sizes = local_df(spark, 
        [(i, 1100000) for i in range(4)], "contig_idx long, size long"
    )
    return interval_complement(
        regions, sizes, keys=("contig_idx", "r_start", "r_stop")
    ).select(
        "contig_idx",
        F.col("r_start").alias("gap_start"),
        F.col("r_stop").alias("gap_stop"),
    )


@query(
    "interval_closest_reads",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_DISTINCT_READS_CTE},
        d AS (
            SELECT r.qname, r.ref_idx,
                   min(greatest(g.r_start - r.stop, r.pos - g.r_stop, 0))
                       AS dist
            FROM dreads r JOIN regions g ON r.ref_idx = g.contig_idx
            GROUP BY r.qname, r.ref_idx, r.pos, r.stop
        )
        SELECT ref_idx, count(*) AS n_reads,
               sum(CASE WHEN dist = 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_overlapping,
               sum(dist)::BIGINT AS sum_dist,
               max(dist)::BIGINT AS max_dist
        FROM d GROUP BY ref_idx
    """,
    doc="bedtools closest: distance from every read to its nearest region "
    "(0 when overlapping). interval_closest (r15) is the sort-merge sweep "
    "as ONE fused chunked scan over a single exploded event frame (running "
    "max of preceding stops, running min of following starts, overlap flag "
    "— all sharing one exchange) + one recombining regroup — never "
    "all-pairs, never a range join. The oracle IS the all-pairs min (cheap "
    "at gate scale), so the sweep is checked against the brute-force "
    "definition.",
)
def interval_closest_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_closest

    reads = _mapped_reads(spark, sf_dir)
    regions = regions_view(spark, sf_dir).select("contig_idx", "r_start", "r_stop")
    d = interval_closest(
        reads, regions,
        keys=("ref_idx", "pos", "stop"),
        right_keys=("contig_idx", "r_start", "r_stop"),
    )
    return d.groupBy("ref_idx").agg(
        F.count(F.lit(1)).alias("n_reads"),
        F.sum(F.when(F.col("closest_dist") == 0, 1).otherwise(0)).alias("n_overlapping"),
        F.sum("closest_dist").alias("sum_dist"),
        F.max("closest_dist").alias("max_dist"),
    )


@query(
    "interval_closest_report",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_DISTINCT_READS_CTE},
        w AS (
            SELECT r.qname, r.ref_idx, r.pos, r.stop,
                (SELECT max(g.r_stop::BIGINT * 10000000 + g.r_start) FROM regions g
                  WHERE g.contig_idx = r.ref_idx
                    AND g.r_start <= r.stop AND g.r_stop >= r.pos) AS ov_k,
                (SELECT max(g.r_stop::BIGINT * 10000000 + g.r_start) FROM regions g
                  WHERE g.contig_idx = r.ref_idx
                    AND g.r_stop <= r.pos) AS prev_k,
                (SELECT min(g.r_start::BIGINT * 10000000 + g.r_stop) FROM regions g
                  WHERE g.contig_idx = r.ref_idx
                    AND g.r_start >= r.stop) AS next_k
            FROM dreads r
        )
        SELECT qname, ref_idx, pos, stop,
            (CASE WHEN ov_k IS NOT NULL THEN 0
                  ELSE least(
                      coalesce(pos - prev_k // 10000000,
                               next_k // 10000000 - stop),
                      coalesce(next_k // 10000000 - stop,
                               pos - prev_k // 10000000)) END
            )::BIGINT AS closest_dist,
            (CASE WHEN ov_k IS NOT NULL THEN ov_k % 10000000
                  WHEN prev_k IS NOT NULL AND (next_k IS NULL
                       OR pos - prev_k // 10000000
                          <= next_k // 10000000 - stop)
                      THEN prev_k % 10000000
                  WHEN next_k IS NOT NULL THEN next_k // 10000000 END
            )::BIGINT AS closest_start,
            (CASE WHEN ov_k IS NOT NULL THEN ov_k // 10000000
                  WHEN prev_k IS NOT NULL AND (next_k IS NULL
                       OR pos - prev_k // 10000000
                          <= next_k // 10000000 - stop)
                      THEN prev_k // 10000000
                  WHEN next_k IS NOT NULL THEN next_k % 10000000 END
            )::BIGINT AS closest_stop
        FROM w
    """,
    doc="bedtools closest with the B feature REPORTED (what bedtools "
    "actually prints), per read: the winning region's coordinates under "
    "deterministic tie rules — overlap -> (max stop, max start); else "
    "the nearer flank, upstream on a distance tie "
    "(operators/interval_join.py interval_closest report_right=True: "
    "the winner rides the SAME fused scan as the distance, the running "
    "max/min carrying a (key, other-coordinate) struct). PARITY CAVEAT "
    "(r16): on overlap TIES this deviates from bedtools -t first (sort-"
    "order min (start, stop)) — selecting that winner inside a running "
    "scan is a 2-D dominance query no single aggregate expresses; use "
    "interval_closest_all (-t all, bedtools' default) for exact tie "
    "parity. The oracle replays the identical argmax/argmin with "
    "packed-key correlated subqueries — per-row brute force.",
)
def interval_closest_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_closest

    reads = _mapped_reads(spark, sf_dir)
    regions = regions_view(spark, sf_dir).select(
        "contig_idx", "r_start", "r_stop"
    )
    return interval_closest(
        reads, regions,
        keys=("ref_idx", "pos", "stop"),
        right_keys=("contig_idx", "r_start", "r_stop"),
        report_right=True,
    ).select(
        "qname", "ref_idx", "pos", "stop",
        "closest_dist", "closest_start", "closest_stop",
    )


@query(
    "interval_closest_io_signed",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_DISTINCT_READS_CTE},
        d AS (
            SELECT r.qname, r.ref_idx, r.pos, r.stop,
                (SELECT min(r.pos - g.r_stop) FROM regions g
                  WHERE g.contig_idx = r.ref_idx AND g.r_stop < r.pos)
                    AS d_prev,
                (SELECT min(g.r_start - r.stop) FROM regions g
                  WHERE g.contig_idx = r.ref_idx AND g.r_start > r.stop)
                    AS d_next
            FROM dreads r
        )
        SELECT qname, ref_idx, pos, stop,
            (CASE WHEN d_prev IS NOT NULL
                       AND (d_next IS NULL OR d_prev <= d_next)
                      THEN -d_prev
                  WHEN d_next IS NOT NULL THEN d_next END
            )::BIGINT AS closest_dist
        FROM d
    """,
    doc="bedtools closest -io -D ref: nearest NON-overlapping region per "
    "read, distance signed (negative when the winner is upstream, i.e. "
    "lower coordinates; upstream preferred on an exact tie). "
    "interval_closest(ignore_overlaps=True, signed=True): the flank "
    "scans flip to STRICT range frames (stop < read.start / "
    "start > read.stop — inclusive frames would admit a touching, i.e. "
    "overlapping, right) and the overlap branch leaves the plan "
    "entirely. The oracle is the brute-force all-pairs min over the "
    "strict candidate sets with the same sign rule.",
)
def interval_closest_io_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_closest

    reads = _mapped_reads(spark, sf_dir)
    regions = regions_view(spark, sf_dir).select(
        "contig_idx", "r_start", "r_stop"
    )
    return interval_closest(
        reads, regions,
        keys=("ref_idx", "pos", "stop"),
        right_keys=("contig_idx", "r_start", "r_stop"),
        ignore_overlaps=True,
        signed=True,
    ).select("qname", "ref_idx", "pos", "stop", "closest_dist")


@query(
    "interval_closest_allties",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_DISTINCT_READS_CTE},
        d AS (
            SELECT r.qname, r.ref_idx, r.pos, r.stop,
                (SELECT min(greatest(g.r_start - r.stop,
                                     r.pos - g.r_stop, 0))
                   FROM regions g WHERE g.contig_idx = r.ref_idx)
                    AS dist
            FROM dreads r
        )
        SELECT d.qname, d.ref_idx, d.pos, d.stop,
               d.dist::BIGINT AS closest_dist,
               g.r_start::BIGINT AS closest_start,
               g.r_stop::BIGINT AS closest_stop
        FROM d LEFT JOIN regions g
          ON g.contig_idx = d.ref_idx
         AND greatest(g.r_start - d.stop, d.pos - g.r_stop, 0) = d.dist
    """,
    doc="bedtools closest -t all — its DEFAULT tie mode: one row per "
    "read PER tied-closest region (all overlapping regions when any "
    "overlaps; otherwise every flank region at exactly the winning "
    "distance, both sides on a tie). interval_closest_all: the fused "
    "scan computes the winning distance, then ties expand through "
    "closed forms — dist 0 <=> the binned overlap join, dist d > 0 "
    "<=> two hash EQUI-joins on (contig, start - d) / (contig, "
    "stop + d) — never a range join, fan-out = the true tie "
    "multiplicity. The oracle is the brute-force all-pairs min joined "
    "back on gap = dist.",
)
def interval_closest_allties(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_closest_all

    reads = _mapped_reads(spark, sf_dir)
    regions = regions_view(spark, sf_dir).select(
        "contig_idx", "r_start", "r_stop"
    )
    return interval_closest_all(
        reads, regions,
        keys=("ref_idx", "pos", "stop"),
        right_keys=("contig_idx", "r_start", "r_stop"),
    ).select(
        "qname", "ref_idx", "pos", "stop",
        "closest_dist", "closest_start", "closest_stop",
    )


@query(
    "interval_closest_stranded",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE},
        sreads AS (
            SELECT DISTINCT qname, ref_idx, pos, stop,
                   CASE WHEN flag & 16 = 16 THEN '-' ELSE '+' END AS strand
            FROM reads WHERE flag & 4 = 0
        ),
        sregions AS (
            SELECT contig_idx, r_start, r_stop,
                   CASE WHEN region_id % 2 = 0 THEN '+' ELSE '-' END
                       AS strand
            FROM regions
        ),
        both_modes AS (
            SELECT 's' AS strand_mode, r.qname, r.ref_idx, r.pos, r.stop,
                   r.strand AS g_want
            FROM sreads r
            UNION ALL
            SELECT 'S' AS strand_mode, r.qname, r.ref_idx, r.pos, r.stop,
                   CASE r.strand WHEN '+' THEN '-' WHEN '-' THEN '+' END
                       AS g_want
            FROM sreads r
        ),
        d AS (
            SELECT m.strand_mode, m.qname, m.ref_idx, m.pos, m.stop,
                (SELECT max(g.r_start <= m.stop AND m.pos <= g.r_stop)
                   FROM sregions g
                  WHERE g.contig_idx = m.ref_idx AND g.strand = m.g_want)
                    AS has_ov,
                (SELECT min(m.pos - g.r_stop) FROM sregions g
                  WHERE g.contig_idx = m.ref_idx AND g.strand = m.g_want
                    AND g.r_stop <= m.pos) AS d_prev,
                (SELECT min(g.r_start - m.stop) FROM sregions g
                  WHERE g.contig_idx = m.ref_idx AND g.strand = m.g_want
                    AND g.r_start >= m.stop) AS d_next
            FROM both_modes m
        )
        SELECT strand_mode, qname, ref_idx, pos, stop,
            (CASE WHEN coalesce(has_ov, FALSE) THEN 0
                  WHEN d_prev IS NOT NULL
                       AND (d_next IS NULL OR d_prev <= d_next)
                      THEN -d_prev
                  WHEN d_next IS NOT NULL THEN d_next END
            )::BIGINT AS closest_dist
        FROM d
    """,
    doc="bedtools closest -s / -S with -D ref: nearest SAME-strand "
    "(mode 's') and OPPOSITE-strand (mode 'S') region per read, signed. "
    "Read strand = FLAG bit 16, region strand = region_id parity. "
    "interval_closest(strand=...) widens the fused scan's partition key "
    "from (contig) to (contig, strand group) — left events carry their "
    "own strand, right events theirs ('same') or its flip ('opposite') "
    "— same single pass, no extra shuffle; a read whose strand group "
    "holds no regions gets NULL like an empty contig. The oracle is the "
    "brute-force all-pairs min under the same strand predicate, both "
    "modes UNION ALLed.",
)
def interval_closest_stranded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_closest

    reads = (
        reads_view(spark, sf_dir)
        .filter(F.col("flag").bitwiseAND(4) == 0)
        .select(
            "qname", "ref_idx", "pos", "stop",
            F.when(F.col("flag").bitwiseAND(16) == 16, F.lit("-"))
            .otherwise(F.lit("+"))
            .alias("strand"),
        )
        .distinct()
    )
    regions = regions_view(spark, sf_dir).select(
        "contig_idx", "r_start", "r_stop",
        F.when(F.col("region_id") % 2 == 0, F.lit("+"))
        .otherwise(F.lit("-"))
        .alias("strand"),
    )
    # BOTH modes in ONE fused sweep: explode each side across the two
    # modes with a (mode, contig) composite partition key; 'S' rows
    # pre-flip the REGION strand so strand="same" computes both -s and
    # -S in a single pass (2x events beats 2x full scans — one
    # exchange+sort instead of two).
    modes = F.explode(F.array(F.lit("s"), F.lit("S"))).alias("strand_mode")
    l2 = reads.select(modes, "*").withColumn(
        "_mc", F.concat_ws("|", F.col("strand_mode"), F.col("ref_idx"))
    )
    flip = F.when(F.col("strand") == "+", F.lit("-")).otherwise(F.lit("+"))
    r2 = (
        regions.select(modes, "*")
        .withColumn(
            "strand", F.when(F.col("strand_mode") == "S", flip)
            .otherwise(F.col("strand")),
        )
        .withColumn(
            "_mc", F.concat_ws("|", F.col("strand_mode"), F.col("contig_idx"))
        )
    )
    return interval_closest(
        l2, r2,
        keys=("_mc", "pos", "stop"),
        right_keys=("_mc", "r_start", "r_stop"),
        strand="same",
        signed=True,
    ).select(
        "strand_mode", "qname", "ref_idx", "pos", "stop", "closest_dist"
    )


# Shared oracle body for the two coverage gates: per-region overlap count
# + covered bases from globally merged reads (see interval_coverage_regions
# doc). Used once plain and once with duplicated input rows.
_COVERAGE_ORACLE_CTES = f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_DISTINCT_READS_CTE},
        {_MERGED_READS_CTE.lstrip()},
        cnt AS (
            SELECT g.region_id, count(*) AS n
            FROM regions g JOIN dreads r
              ON r.ref_idx = g.contig_idx
             AND r.pos <= g.r_stop AND g.r_start <= r.stop
            GROUP BY g.region_id
        ),
        covd AS (
            SELECT g.region_id,
                   sum(least(m.me2, g.contig_idx * {_AXIS} + g.r_stop)
                       - greatest(m.ms2, g.contig_idx * {_AXIS} + g.r_start)
                       + 1) AS covered
            FROM regions g JOIN mreads m
              ON g.contig_idx = m.ref_idx
             AND g.contig_idx * {_AXIS} + g.r_start <= m.me2
             AND m.ms2 <= g.contig_idx * {_AXIS} + g.r_stop
            GROUP BY g.region_id
        ),
        base AS (
            SELECT g.region_id, g.contig_idx,
                   g.r_start::BIGINT AS r_start, g.r_stop::BIGINT AS r_stop,
                   COALESCE(c.n, 0)::BIGINT AS n_overlaps,
                   COALESCE(v.covered, 0)::BIGINT AS covered_bases,
                   (g.r_stop - g.r_start + 1)::BIGINT AS interval_len,
                   COALESCE(v.covered, 0) / (g.r_stop - g.r_start + 1.0)
                       AS coverage_fraction
            FROM regions g
            LEFT JOIN cnt c USING (region_id)
            LEFT JOIN covd v USING (region_id)
        )
"""


@query(
    "interval_coverage_regions",
    oracle=_COVERAGE_ORACLE_CTES + """
        SELECT * FROM base
    """,
    doc="bedtools coverage: per region, how many reads overlap it and what "
    "fraction of its bases they cover. interval_coverage = ONE binned "
    "overlap join + one regroup; covered bases come from merging the "
    "CLIPPED reads per region inside an array aggregate (bounded by the "
    "region's pileup — no pre-merge pass over the read side). The oracle "
    "instead merges ALL reads globally on the single axis and clips the "
    "merged runs, a different factorization of the same per-base truth.",
)
def interval_coverage_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_coverage

    reads = _mapped_reads(spark, sf_dir).select("ref_idx", "pos", "stop")
    regions = regions_view(spark, sf_dir)
    return interval_coverage(
        regions, reads,
        keys=("contig_idx", "r_start", "r_stop"),
        right_keys=("ref_idx", "pos", "stop"),
    ).select(
        "region_id", "contig_idx", "r_start", "r_stop",
        "n_overlaps", "covered_bases", "interval_len", "coverage_fraction",
    )


@query(
    "interval_coverage_dup_rows",
    oracle=_COVERAGE_ORACLE_CTES + """
        SELECT * FROM base UNION ALL SELECT * FROM base
    """,
    doc="bedtools emits one output line per INPUT line, duplicates "
    "included — r16's duplicate-input contract for the regroup operators "
    "(operators/interval_join.py _with_dup_count/_reemit_dups: exact "
    "duplicate left tuples collapse to one row + a count before the "
    "join, so per-tuple aggregates cannot double through the joined "
    "copies, and re-emit per input row after the regroup). The input is "
    "the regions table unioned with itself; the oracle is the "
    "unique-input coverage truth emitted twice.",
)
def interval_coverage_dup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_coverage

    reads = _mapped_reads(spark, sf_dir).select("ref_idx", "pos", "stop")
    regions = regions_view(spark, sf_dir)
    return interval_coverage(
        regions.unionByName(regions), reads,
        keys=("contig_idx", "r_start", "r_stop"),
        right_keys=("ref_idx", "pos", "stop"),
    ).select(
        "region_id", "contig_idx", "r_start", "r_stop",
        "n_overlaps", "covered_bases", "interval_len", "coverage_fraction",
    )


@query(
    "genome_windows_tiling",
    oracle="""
        WITH sz AS (
            SELECT * FROM (VALUES (0, 997000), (1, 1010001),
                                  (2, 1023002), (3, 1036003)) AS t(c, size)
        ),
        idx AS (
            SELECT c, size,
                   unnest(generate_series(0, (size - 1) // 7000)) AS i
            FROM sz
        ),
        wins AS (
            SELECT c, i * 7000 + 1 AS start,
                   least(i * 7000 + 10000, size) AS stop
            FROM idx
        )
        SELECT c::BIGINT AS contig_idx, count(*) AS n_windows,
               min(start)::BIGINT AS min_start, max(stop)::BIGINT AS max_stop,
               sum(stop - start + 1)::BIGINT AS covered_bases
        FROM wins GROUP BY c
    """,
    doc="bedtools makewindows: tile each contig of a sizes table into "
    "overlapping 10 kb windows at 7 kb stride, last window clipped at "
    "the contig end (operators/interval_join.py genome_makewindows — a "
    "generator explode from the dimension-sized table, round-robin "
    "repartitioned so downstream stages aren't capped at #contigs "
    "tasks). The oracle re-derives the tiling with generate_series.",
)
def genome_windows_tiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import genome_makewindows

    sizes = local_df(spark, 
        [(i, 997000 + i * 13001) for i in range(4)],
        "contig_idx long, size long",
    )
    wins = genome_makewindows(sizes, 10000, step=7000)
    return wins.groupBy(F.col("contig").alias("contig_idx")).agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.min("start").alias("min_start"),
        F.max("stop").alias("max_stop"),
        F.sum(F.col("stop") - F.col("start") + 1).alias("covered_bases"),
    )


@query(
    "interval_intersect_fraction",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_DISTINCT_READS_CTE},
        q AS (
            SELECT r.ref_idx, r.qname,
                   least(r.stop, g.r_stop) - greatest(r.pos, g.r_start) + 1
                       AS ov
            FROM dreads r JOIN regions g
              ON r.ref_idx = g.contig_idx
             AND r.pos <= g.r_stop AND g.r_start <= r.stop
            WHERE least(r.stop, g.r_stop) - greatest(r.pos, g.r_start) + 1
                  >= 0.5 * (r.stop - r.pos + 1)
        )
        SELECT ref_idx, count(*) AS n_pairs,
               count(DISTINCT qname) AS n_reads,
               sum(ov)::BIGINT AS overlap_bases,
               min(ov)::BIGINT AS min_overlap
        FROM q GROUP BY ref_idx
    """,
    doc="bedtools intersect -f 0.5: reads counted against a region only "
    "when at least HALF the read is inside it (operators/interval_join.py "
    "interval_join_binned min_frac_left — the fraction predicate is part "
    "of the binned join's match definition, so the tile dedup and outer "
    "modes all see the filtered matches; -F/-e/-r are the mirror/either/"
    "reciprocal forms). The oracle applies the identical fraction "
    "predicate on an all-pairs SQL join.",
)
def interval_intersect_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_join_binned

    reads = _mapped_reads(spark, sf_dir).select("qname", "ref_idx", "pos", "stop")
    regions = regions_view(spark, sf_dir).select(
        "contig_idx", "r_start", "r_stop"
    )
    hits = interval_join_binned(
        reads, regions,
        left_keys=("ref_idx", "pos", "stop"),
        right_keys=("contig_idx", "r_start", "r_stop"),
        min_frac_left=0.5,
    )
    ov = (
        F.least(F.col("stop"), F.col("r_stop"))
        - F.greatest(F.col("pos"), F.col("r_start"))
        + 1
    )
    return hits.select("ref_idx", "qname", ov.alias("_ov")).groupBy(
        "ref_idx"
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("qname").alias("n_reads"),
        F.sum("_ov").alias("overlap_bases"),
        F.min("_ov").alias("min_overlap"),
    )


@query(
    "interval_intersect_stranded",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE},
        sreads AS (
            SELECT DISTINCT qname, ref_idx, pos, stop,
                   CASE WHEN flag & 16 = 16 THEN '-' ELSE '+' END AS strand
            FROM reads WHERE flag & 4 = 0
        ),
        sregions AS (
            SELECT contig_idx, r_start, r_stop,
                   CASE WHEN region_id % 2 = 0 THEN '+' ELSE '-' END
                       AS strand
            FROM regions
        ),
        q AS (
            SELECT 's' AS strand_mode, r.ref_idx, r.qname
            FROM sreads r JOIN sregions g
              ON r.ref_idx = g.contig_idx
             AND r.pos <= g.r_stop AND g.r_start <= r.stop
             AND r.strand = g.strand
            UNION ALL
            SELECT 'S' AS strand_mode, r.ref_idx, r.qname
            FROM sreads r JOIN sregions g
              ON r.ref_idx = g.contig_idx
             AND r.pos <= g.r_stop AND g.r_start <= r.stop
             AND r.strand = CASE g.strand WHEN '+' THEN '-'
                                          WHEN '-' THEN '+' END
        )
        SELECT strand_mode, ref_idx, count(*) AS n_pairs,
               count(DISTINCT qname) AS n_reads
        FROM q GROUP BY strand_mode, ref_idx
    """,
    doc="bedtools intersect -s / -S: overlapping (read, region) pairs "
    "restricted to the same (mode 's') / opposite (mode 'S') strand — "
    "read strand = FLAG bit 16, region strand = region_id parity. "
    "interval_join_binned(strand=...): the restriction is an "
    "equi-conjunct in the binned join's MATCH definition, so Catalyst "
    "folds it into the shuffle join keys and the tile dedup and outer "
    "modes all see the filtered matches — no extra pass. The oracle "
    "applies the identical strand predicate on an all-pairs SQL join, "
    "both modes UNION ALLed.",
)
def interval_intersect_stranded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_join_binned

    reads = (
        reads_view(spark, sf_dir)
        .filter(F.col("flag").bitwiseAND(4) == 0)
        .select(
            "qname", "ref_idx", "pos", "stop",
            F.when(F.col("flag").bitwiseAND(16) == 16, F.lit("-"))
            .otherwise(F.lit("+"))
            .alias("strand"),
        )
        .distinct()
    )
    regions = regions_view(spark, sf_dir).select(
        "contig_idx", "r_start", "r_stop",
        F.when(F.col("region_id") % 2 == 0, F.lit("+"))
        .otherwise(F.lit("-"))
        .alias("g_strand"),
    )
    parts = []
    for mode, how in (("s", "same"), ("S", "opposite")):
        hits = interval_join_binned(
            reads, regions,
            left_keys=("ref_idx", "pos", "stop"),
            right_keys=("contig_idx", "r_start", "r_stop"),
            strand=how,
            strand_cols=("strand", "g_strand"),
        )
        parts.append(
            hits.select(F.lit(mode).alias("strand_mode"), "ref_idx", "qname")
        )
    return parts[0].unionByName(parts[1]).groupBy(
        "strand_mode", "ref_idx"
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("qname").alias("n_reads"),
    )


@query(
    "interval_window_proximity",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_DISTINCT_READS_CTE}
        SELECT g.region_id, g.contig_idx,
               g.r_start::BIGINT AS r_start, g.r_stop::BIGINT AS r_stop,
               count(r.pos)::BIGINT AS n_near
        FROM regions g LEFT JOIN dreads r
          ON r.ref_idx = g.contig_idx
         AND r.pos <= g.r_stop + 5000 AND g.r_start - 5000 <= r.stop
        GROUP BY g.region_id, g.contig_idx, g.r_start, g.r_stop
    """,
    doc="bedtools window: count reads within 5 kb of each region — an "
    "overlap join with a proximity margin (operators/interval_join.py "
    "interval_window: the binned tile join runs on the widened span so "
    "no match can fall outside the joined bins, output keeps original "
    "coordinates; loose-left-outer mode keeps zero-match regions at "
    "count 0). The oracle is a plain widened-bounds SQL left join.",
)
def interval_window_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_window

    reads = _mapped_reads(spark, sf_dir).select("ref_idx", "pos", "stop")
    regions = regions_view(spark, sf_dir)
    near = interval_window(
        regions, reads, before=5000, after=5000,
        keys=("contig_idx", "r_start", "r_stop"),
        right_keys=("ref_idx", "pos", "stop"),
        how="left_outer_loose",
    )
    return near.groupBy("region_id", "contig_idx", "r_start", "r_stop").agg(
        F.count("pos").alias("n_near")
    )


@query(
    "interval_reldist_reads",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_DISTINCT_READS_CTE},
        lm AS (
            SELECT ref_idx AS c, (pos - 1 + stop) // 2 AS m FROM dreads
        ),
        rm AS (
            SELECT contig_idx AS c, (r_start - 1 + r_stop) // 2 AS m
            FROM regions
        ),
        fl AS (
            SELECT l.c, l.m,
                (SELECT max(r.m) FROM rm r
                  WHERE r.c = l.c AND r.m <= l.m) AS prev,
                (SELECT min(r.m) FROM rm r
                  WHERE r.c = l.c AND r.m > l.m) AS next
            FROM lm l
        ),
        rel AS (
            SELECT floor((least(m - prev, next - m)::DOUBLE
                          / (next - prev)) * 100) / 100 AS reldist
            FROM fl
            WHERE prev IS NOT NULL AND next IS NOT NULL
        )
        SELECT reldist, count(*) AS count,
               count(*) / (SELECT count(*) FROM rel) AS fraction
        FROM rel GROUP BY reldist
    """,
    doc="bedtools reldist: the relative-distance distribution of read "
    "midpoints to their flanking region midpoints — uniform on [0, 0.5] "
    "under spatial independence, skewed to 0 under colocalization; an "
    "exactly-coincident midpoint reports 0.00, like bedtools "
    "(operators/interval_join.py interval_reldist: ONE fused chunked "
    "scan over the unioned midpoints — inclusive preceding max + strict "
    "following min share a single range-frame window pass — no "
    "per-contig window, nothing all-pairs). The oracle derives each "
    "read's flanking region midpoints with correlated subqueries — "
    "per-row brute force.",
)
def interval_reldist_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_reldist

    reads = _mapped_reads(spark, sf_dir).select("ref_idx", "pos", "stop")
    regions = regions_view(spark, sf_dir)
    return interval_reldist(
        reads, regions,
        keys=("ref_idx", "pos", "stop"),
        right_keys=("contig_idx", "r_start", "r_stop"),
    )


@query(
    "interval_shuffle_null_model",
    oracle=f"""
        WITH {REGIONS_CTE},
        sh AS (
            SELECT region_id, contig_idx,
                   ('0x' || substr(md5('ivshuffle:'
                        || contig_idx::VARCHAR || ':'
                        || r_start::VARCHAR || ':'
                        || r_stop::VARCHAR), 1, 15))::BIGINT
                     % (1000000 - (r_stop - r_start + 1) + 1) + 1 AS ns,
                   r_stop - r_start + 1 AS ln
            FROM regions
        )
        SELECT region_id, contig_idx, ns::BIGINT AS r_start,
               (ns + ln - 1)::BIGINT AS r_stop, ln::BIGINT AS ilen
        FROM sh
    """,
    doc="bedtools shuffle (-chrom): place every region at a deterministic "
    "pseudo-random same-contig position, lengths preserved — the null "
    "model for reldist/jaccard colocalization tests "
    "(operators/interval_join.py interval_shuffle: map-only md5-hash "
    "draw + broadcast sizes join; reproducible across runs, retries and "
    "engines). The oracle replays the identical md5 arithmetic in "
    "DuckDB, so placement must match bit-for-bit.",
)
def interval_shuffle_null_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_shuffle

    regions = regions_view(spark, sf_dir)
    sizes = local_df(spark, 
        [(i, 1000000) for i in range(4)], "contig_idx long, size long"
    )
    sh = interval_shuffle(
        regions, sizes, keys=("contig_idx", "r_start", "r_stop")
    )
    return sh.select(
        "region_id", "contig_idx", "r_start", "r_stop",
        (F.col("r_stop") - F.col("r_start") + 1).alias("ilen"),
    )


@query(
    "interval_shuffle_genome",
    oracle=f"""
        WITH {REGIONS_CTE},
        sz AS (
            SELECT * FROM (VALUES (0, 1000000), (1, 400000),
                                  (2, 200000), (3, 100000)) t(c, size)
        ),
        rr AS (
            SELECT region_id, r_stop - r_start + 1 AS ln,
                   ('0x' || substr(md5('ivshuffle:'
                        || region_id::VARCHAR), 1, 15))::BIGINT AS h
            FROM regions
        ),
        walk AS (
            SELECT rr.region_id, rr.ln, rr.h, sz.c,
                   greatest(0, sz.size - rr.ln + 1) AS room,
                   coalesce(sum(greatest(0, sz.size - rr.ln + 1)) OVER (
                       PARTITION BY rr.region_id ORDER BY sz.c
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum,
                   sum(greatest(0, sz.size - rr.ln + 1)) OVER (
                       PARTITION BY rr.region_id) AS total
            FROM rr CROSS JOIN sz
        )
        SELECT region_id, c AS contig_idx,
               (h % total - cum + 1)::BIGINT AS r_start,
               (h % total - cum + ln)::BIGINT AS r_stop,
               ln::BIGINT AS ilen
        FROM walk
        WHERE total > 0 AND h % total >= cum AND h % total < cum + room
    """,
    doc="bedtools shuffle, genome-wide (default, non -chrom) mode: every "
    "region is re-placed uniformly over all VALID placements across an "
    "uneven 4-contig genome — each contig weighs in with "
    "max(0, size - len + 1) slots and the md5 draw walks the cumulative "
    "rooms (operators/interval_join.py interval_shuffle "
    "keep_contig=False: map-only fold over the literal contig list, no "
    "join, no end-of-contig pile-up). The oracle replays the identical "
    "walk relationally (cross join x cumulative window), so contig "
    "choice AND offset must match bit-for-bit.",
)
def interval_shuffle_genome(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_shuffle

    regions = regions_view(spark, sf_dir)
    sizes = local_df(spark, 
        [(0, 1000000), (1, 400000), (2, 200000), (3, 100000)],
        "contig_idx long, size long",
    )
    sh = interval_shuffle(
        regions.select("region_id", "contig_idx", "r_start", "r_stop"),
        sizes,
        keys=("contig_idx", "r_start", "r_stop"),
        id_col="region_id",
        keep_contig=False,
    )
    return sh.select(
        "region_id", "contig_idx", "r_start", "r_stop",
        (F.col("r_stop") - F.col("r_start") + 1).alias("ilen"),
    )


@query(
    "interval_random_genome",
    oracle="""
        WITH sz AS (
            SELECT * FROM (VALUES (0, 1000000), (1, 400000),
                                  (2, 200000), (3, 100000)) t(c, size)
        ),
        ids AS (
            SELECT unnest(generate_series(0, 1999))::BIGINT AS interval_id
        ),
        rr AS (
            SELECT interval_id,
                   ('0x' || substr(md5('ivrandom:'
                        || interval_id::VARCHAR), 1, 15))::BIGINT AS h
            FROM ids
        ),
        walk AS (
            SELECT rr.interval_id, rr.h, sz.c,
                   greatest(0, sz.size - 1500 + 1) AS room,
                   coalesce(sum(greatest(0, sz.size - 1500 + 1)) OVER (
                       PARTITION BY rr.interval_id ORDER BY sz.c
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum,
                   sum(greatest(0, sz.size - 1500 + 1)) OVER (
                       PARTITION BY rr.interval_id) AS total
            FROM rr CROSS JOIN sz
        )
        SELECT interval_id, c AS contig_idx,
               (h % total - cum + 1)::BIGINT AS r_start,
               (h % total - cum + 1500)::BIGINT AS r_stop
        FROM walk
        WHERE total > 0 AND h % total >= cum AND h % total < cum + room
    """,
    doc="bedtools random (-n 2000 -l 1500, salt as -seed): generate "
    "deterministic pseudo-random fixed-length intervals uniform over "
    "every valid placement on an uneven 4-contig genome "
    "(operators/interval_join.py interval_random: a spark.range "
    "generator through interval_shuffle's genome-wide weighted-room "
    "fold — map-only, no join, no shuffle; the null-model generator "
    "for reldist/jaccard colocalization tests). The oracle replays the "
    "identical md5 draw + cumulative-room walk relationally, so contig "
    "choice AND offset must match bit-for-bit.",
)
def interval_random_genome(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_random

    sizes = local_df(spark, 
        [(0, 1000000), (1, 400000), (2, 200000), (3, 100000)],
        "contig_idx long, size long",
    )
    return interval_random(
        sizes, n=2000, length=1500,
        keys=("contig_idx", "r_start", "r_stop"),
    )


@query(
    "interval_map_mapq",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE},
        dmr AS (
            SELECT DISTINCT qname, ref_idx, pos, stop, mapq
            FROM reads WHERE flag & 4 = 0
        ),
        agg AS (
            SELECT g.region_id,
                   count(r.mapq) AS n_reads,
                   sum(r.mapq) AS sum_mapq,
                   max(r.mapq) AS max_mapq,
                   round(avg(r.mapq), 6) AS mean_mapq
            FROM regions g LEFT JOIN dmr r
              ON r.ref_idx = g.contig_idx
             AND r.pos <= g.r_stop AND g.r_start <= r.stop
            GROUP BY g.region_id
        )
        SELECT g.region_id, g.contig_idx,
               g.r_start::BIGINT AS r_start, g.r_stop::BIGINT AS r_stop,
               a.n_reads::BIGINT AS n_reads, a.sum_mapq::BIGINT AS sum_mapq,
               a.max_mapq::BIGINT AS max_mapq, a.mean_mapq
        FROM regions g JOIN agg a USING (region_id)
    """,
    doc="bedtools map: per target region, aggregate a value column (mapq) "
    "over every overlapping read — count/sum/max/mean in one pass "
    "(operators/interval_join.py interval_map: ONE loose-left-outer "
    "binned tile join + one regroup on the region tuple; zero-match "
    "regions survive with NULL aggregates / count 0, bedtools' '.'). "
    "The oracle is a plain SQL left join + group-by — any bin-dedup or "
    "loose-null-row bug diverges from it.",
)
def interval_map_mapq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_map

    reads = (
        reads_view(spark, sf_dir)
        .filter(F.col("flag").bitwiseAND(4) == 0)
        .select("qname", "ref_idx", "pos", "stop", "mapq")
        .distinct()
        .select("ref_idx", "pos", "stop", "mapq")
    )
    regions = regions_view(spark, sf_dir)
    mapped = interval_map(
        regions, reads,
        specs=[
            ("mapq", "count", "n_reads"),
            ("mapq", "sum", "sum_mapq"),
            ("mapq", "max", "max_mapq"),
            ("mapq", "mean", "mean_mapq"),
        ],
        keys=("contig_idx", "r_start", "r_stop"),
        right_keys=("ref_idx", "pos", "stop"),
    )
    return mapped.select(
        "region_id", "contig_idx", "r_start", "r_stop",
        F.col("n_reads").cast("long").alias("n_reads"),
        F.col("sum_mapq").cast("long").alias("sum_mapq"),
        F.col("max_mapq").cast("long").alias("max_mapq"),
        F.round("mean_mapq", 6).alias("mean_mapq"),
    )


@query(
    "interval_jaccard_reads_regions",
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_MERGED_READS_CTE},
        {_MERGED_REGIONS_CTE.lstrip()},
        inter AS (
            SELECT COALESCE(sum(least(a.me2, b.contig_idx * {_AXIS} + b.m_stop)
                       - greatest(a.ms2, b.contig_idx * {_AXIS} + b.m_start)
                       + 1), 0)::BIGINT AS intersection_bases,
                   count(*) AS n_intersections
            FROM mreads a JOIN mregions b
              ON a.ref_idx = b.contig_idx
             AND a.ms2 <= b.contig_idx * {_AXIS} + b.m_stop
             AND b.contig_idx * {_AXIS} + b.m_start <= a.me2
        ),
        cov AS (
            SELECT (SELECT sum(me2 - ms2 + 1) FROM mreads) AS cov_a,
                   (SELECT sum(m_stop - m_start + 1) FROM mregions) AS cov_b
        )
        SELECT i.intersection_bases,
               (c.cov_a + c.cov_b - i.intersection_bases)::BIGINT
                   AS union_bases,
               i.intersection_bases
                   / (c.cov_a + c.cov_b - i.intersection_bases * 1.0)
                   AS jaccard,
               i.n_intersections
        FROM inter i, cov c
    """,
    doc="bedtools jaccard: |reads ∩ regions| / |reads ∪ regions| in covered "
    "bases after flattening both sides. interval_jaccard (r15) = ONE "
    "interval_multiinter pass (composite-key two-phase merge + fused "
    "boundary sweep) + one scalar aggregate over the constant-coverage "
    "segments — both-covered segments are the intersection, all covered "
    "segments the union, and each maximal both-covered segment is one "
    "merged-pair intersection. No merged-sets self-join, no recomputed "
    "merge branches. Oracle folds both sides onto the single axis and "
    "intersects the merged runs directly.",
)
def interval_jaccard_reads_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_jaccard

    reads = _mapped_reads(spark, sf_dir).select("ref_idx", "pos", "stop")
    regions = regions_view(spark, sf_dir).select("contig_idx", "r_start", "r_stop")
    return interval_jaccard(
        reads, regions,
        keys_a=("ref_idx", "pos", "stop"),
        keys_b=("contig_idx", "r_start", "r_stop"),
    )


# ---------------------------------------------------------------------------
# Variant-analysis layer (the bcftools-stats analog over the engine's VCF
# data model, VariantContextCodec.java:267-335): classification, ts/tv,
# allele-frequency spectrum — all single-pass JVM-side conditional
# aggregation, the same shape as flagstat.
# ---------------------------------------------------------------------------

# Deterministic derived variants (from orders): numeric ref/alt allele
# indexes into 'ACGT' (A=0 C=1 G=2 T=3; a transition flips purine<->purine /
# pyrimidine<->pyrimidine, i.e. |ref - alt| == 2), a variant-class code, and
# AC/AN allele counts.
VARIANTS_CTE = """
variants AS (
    SELECT o_orderkey,
           o_custkey % 4 AS contig_idx,
           (o_orderkey * 13) % 1000000 + 1 AS pos,
           (o_orderkey * 7) % 4 AS ref_i,
           ((o_orderkey * 7) % 4 + 1 + (o_orderkey * 11) % 3) % 4 AS alt_i,
           o_orderkey % 10 AS kind_i,
           (o_orderkey * 5) % 101 AS ac,
           100 AS an
    FROM orders
)
"""


def variants_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived variant table; mirrors VARIANTS_CTE exactly."""
    o = _t(spark, sf_dir, "orders")
    ref_i = (F.col("o_orderkey") * 7) % 4
    return o.select(
        "o_orderkey",
        (F.col("o_custkey") % 4).cast("long").alias("contig_idx"),
        ((F.col("o_orderkey") * 13) % 1000000 + 1).cast("long").alias("pos"),
        ref_i.cast("long").alias("ref_i"),
        ((ref_i + 1 + (F.col("o_orderkey") * 11) % 3) % 4).cast("long").alias("alt_i"),
        (F.col("o_orderkey") % 10).cast("long").alias("kind_i"),
        ((F.col("o_orderkey") * 5) % 101).cast("long").alias("ac"),
        F.lit(100).cast("long").alias("an"),
    )


@query(
    "variant_stats",
    oracle=f"""
        WITH {VARIANTS_CTE}
        SELECT contig_idx,
               count(*) AS n_variants,
               sum(CASE WHEN kind_i <= 6 THEN 1 ELSE 0 END)::BIGINT AS n_snp,
               sum(CASE WHEN kind_i IN (7, 8) THEN 1 ELSE 0 END)::BIGINT
                   AS n_ins,
               sum(CASE WHEN kind_i = 9 THEN 1 ELSE 0 END)::BIGINT AS n_del,
               sum(CASE WHEN kind_i <= 6 AND abs(ref_i - alt_i) = 2
                        THEN 1 ELSE 0 END)::BIGINT AS n_ts,
               sum(CASE WHEN kind_i <= 6 AND abs(ref_i - alt_i) != 2
                        THEN 1 ELSE 0 END)::BIGINT AS n_tv,
               sum(CASE WHEN kind_i <= 6 AND abs(ref_i - alt_i) = 2
                        THEN 1 ELSE 0 END)
                   / (sum(CASE WHEN kind_i <= 6 AND abs(ref_i - alt_i) != 2
                               THEN 1 ELSE 0 END) * 1.0) AS tstv
        FROM variants GROUP BY contig_idx
    """,
    doc="bcftools-stats analog: per-contig variant classification "
    "(SNP/INS/DEL) and the transition/transversion ratio, the standard VCF "
    "QC summary, as ONE map-side-combinable conditional aggregation pass "
    "(same scale shape as flagstat — no window, no join; the ts test is "
    "numeric: allele indexes into ACGT differ by exactly 2).",
)
def variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = variants_view(spark, sf_dir)
    is_snp = F.col("kind_i") <= 6
    is_ts = is_snp & (F.abs(F.col("ref_i") - F.col("alt_i")) == 2)
    is_tv = is_snp & (F.abs(F.col("ref_i") - F.col("alt_i")) != 2)
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return v.groupBy("contig_idx").agg(
        F.count(F.lit(1)).alias("n_variants"),
        one(is_snp).alias("n_snp"),
        one(F.col("kind_i").isin(7, 8)).alias("n_ins"),
        one(F.col("kind_i") == 9).alias("n_del"),
        one(is_ts).alias("n_ts"),
        one(is_tv).alias("n_tv"),
        (one(is_ts) / (one(is_tv) * 1.0)).alias("tstv"),
    )


@query(
    "allele_frequency_spectrum",
    oracle=f"""
        WITH {VARIANTS_CTE}
        SELECT least(floor(ac * 10.0 / an), 9)::BIGINT AS af_bucket,
               count(*) AS n_variants,
               sum(ac)::BIGINT AS sum_ac,
               sum(ac) / (100.0 * count(*)) AS mean_af
        FROM variants GROUP BY 1
    """,
    doc="Site-frequency spectrum: allele frequency (AC/AN) histogram in 10 "
    "fixed buckets — one hash aggregation over the typed INFO-field access "
    "pattern (VariantContextCodec.java:267-335); fixed bucket keys mean "
    "bounded cardinality and perfect partial aggregation at any scale.",
)
def allele_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = variants_view(spark, sf_dir)
    bucket = F.least(F.floor(F.col("ac") * 10.0 / F.col("an")), F.lit(9)).cast("long")
    return v.groupBy(bucket.alias("af_bucket")).agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.sum("ac").alias("sum_ac"),
        (F.sum("ac") / (100.0 * F.count(F.lit(1)))).alias("mean_af"),
    )


@query(
    "gc_content_histogram",
    oracle=f"""
        WITH {READS_CTE},
        seqs AS (
            SELECT translate(md5(qname), '0123456789abcdef',
                             'ACGTACGTACGTACGT') AS seq
            FROM reads
        )
        SELECT floor((32 - length(translate(seq, 'GC', ''))) * 10.0 / 32)::BIGINT
                   AS gc_bucket,
               count(*) AS n_reads,
               sum(32 - length(translate(seq, 'GC', '')))::BIGINT AS sum_gc
        FROM seqs GROUP BY 1
    """,
    doc="Per-read GC-content histogram — the FastQC per-sequence-GC module — "
    "over deterministic 32-base sequences (md5-derived so both engines "
    "agree byte-for-byte). The GC count is pure translate()/length() "
    "arithmetic: JVM-side, codegen, zero UDFs (same technique as "
    "quality_recode, reference SequencedFragment.java:229-268).",
)
def gc_content_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = reads_view(spark, sf_dir)
    seq = F.translate(F.md5(F.col("qname")), "0123456789abcdef", "ACGTACGTACGTACGT")
    gc = F.lit(32) - F.length(F.translate(seq, "GC", ""))
    bucket = F.floor(gc * 10.0 / 32).cast("long")
    return reads.select(gc.alias("_gc"), bucket.alias("gc_bucket")).groupBy(
        "gc_bucket"
    ).agg(
        F.count(F.lit(1)).alias("n_reads"),
        F.sum("_gc").alias("sum_gc"),
    )


# ---------------------------------------------------------------------------
# Genotype-matrix layer: callset concordance + trio Mendelian checks —
# what a multi-sample VCF user (VariantContextCodec's genotype block,
# VariantContextWithHeader.java) computes right after parsing. Genotype
# codes: 0=hom-ref, 1=het, 2=hom-alt, 3=missing. The double-mod
# (k*m % p) % q arithmetic is deliberately NON-linear in k mod q so the
# derived samples decorrelate (a single linear map would make every
# sample a function of the others).
# ---------------------------------------------------------------------------


@query(
    "genotype_concordance",
    oracle="""
        WITH a AS (
            SELECT o_orderkey AS site_id,
                   (o_orderkey * 13 % 101) % 4 AS gt_a
            FROM orders
        ), b AS (
            SELECT o_orderkey AS site_id,
                   (o_orderkey * 29 % 103) % 4 AS gt_b
            FROM orders
        )
        SELECT gt_a, gt_b, count(*) AS n_sites
        FROM a JOIN b USING (site_id)
        GROUP BY gt_a, gt_b
    """,
    doc="bcftools gtcheck analog: the 4x4 genotype confusion matrix "
    "(hom-ref/het/hom-alt/missing) between two callsets over the same "
    "sites — one shuffle equi-join on the site key + a bounded-cardinality "
    "aggregation (16 output groups, perfect partial agg). At 100 TB the "
    "join partitions on site_id with no skew (sites are unique per "
    "callset).",
)
def genotype_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_orderkey").alias("site_id"),
        ((F.col("o_orderkey") * 13 % 101) % 4).cast("long").alias("gt_a"),
    )
    b = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("site_id"),
        ((F.col("o_orderkey") * 29 % 103) % 4).cast("long").alias("gt_b"),
    )
    return (
        a.join(b, on="site_id")
        .groupBy("gt_a", "gt_b")
        .agg(F.count(F.lit(1)).alias("n_sites"))
    )


@query(
    "mendelian_violations",
    oracle="""
        WITH gts AS (
            SELECT o_orderkey AS site_id, o_custkey % 4 AS contig_idx,
                   'M' AS sample_id, (o_orderkey * 13 % 101) % 3 AS gt
            FROM orders
            UNION ALL
            SELECT o_orderkey, o_custkey % 4, 'F',
                   (o_orderkey * 29 % 103) % 3
            FROM orders
            UNION ALL
            SELECT o_orderkey, o_custkey % 4, 'C',
                   (o_orderkey * 31 % 107) % 3
            FROM orders
        ), trio AS (
            SELECT site_id, min(contig_idx) AS contig_idx,
                   max(CASE WHEN sample_id = 'M' THEN gt END) AS gt_m,
                   max(CASE WHEN sample_id = 'F' THEN gt END) AS gt_f,
                   max(CASE WHEN sample_id = 'C' THEN gt END) AS gt_c
            FROM gts GROUP BY site_id
        ), judged AS (
            SELECT contig_idx,
                   CASE WHEN gt_c
                             < (CASE WHEN gt_m = 2 THEN 1 ELSE 0 END
                                + CASE WHEN gt_f = 2 THEN 1 ELSE 0 END)
                          OR gt_c
                             > (CASE WHEN gt_m > 0 THEN 1 ELSE 0 END
                                + CASE WHEN gt_f > 0 THEN 1 ELSE 0 END)
                        THEN 1 ELSE 0 END AS viol
            FROM trio
        )
        SELECT contig_idx, count(*) AS n_sites,
               sum(viol)::BIGINT AS n_violations,
               sum(viol) / (count(*) * 1.0) AS violation_rate
        FROM judged GROUP BY contig_idx
    """,
    doc="Trio Mendelian-violation scan: the LONG genotype table (one row "
    "per sample x site — the multi-sample VCF layout) pivots to wide "
    "(gt_mother, gt_father, gt_child) via ONE groupBy(site) conditional "
    "aggregation (no joins, no per-sample passes), then the transmission "
    "rule — the child's alt-allele count must lie in "
    "[#homalt parents, #carrier parents] — is pure arithmetic. Scale "
    "shape: one shuffle on the unique site key; sample count widens the "
    "aggregate, never the shuffle row count.",
)
def mendelian_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def sample(tag: str, mult: int, mod: int) -> DataFrame:
        return o.select(
            F.col("o_orderkey").alias("site_id"),
            (F.col("o_custkey") % 4).cast("long").alias("contig_idx"),
            F.lit(tag).alias("sample_id"),
            ((F.col("o_orderkey") * mult % mod) % 3).cast("long").alias("gt"),
        )

    gts = sample("M", 13, 101).unionByName(sample("F", 29, 103)).unionByName(
        sample("C", 31, 107)
    )
    pick = lambda t: F.max(F.when(F.col("sample_id") == t, F.col("gt")))  # noqa: E731
    trio = gts.groupBy("site_id").agg(
        F.min("contig_idx").alias("contig_idx"),
        pick("M").alias("gt_m"),
        pick("F").alias("gt_f"),
        pick("C").alias("gt_c"),
    )
    homalt_parents = (
        F.when(F.col("gt_m") == 2, 1).otherwise(0)
        + F.when(F.col("gt_f") == 2, 1).otherwise(0)
    )
    carrier_parents = (
        F.when(F.col("gt_m") > 0, 1).otherwise(0)
        + F.when(F.col("gt_f") > 0, 1).otherwise(0)
    )
    viol = F.when(
        (F.col("gt_c") < homalt_parents) | (F.col("gt_c") > carrier_parents), 1
    ).otherwise(0)
    return (
        trio.select("contig_idx", viol.alias("viol"))
        .groupBy("contig_idx")
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            F.sum("viol").alias("n_violations"),
            (F.sum("viol") / (F.count(F.lit(1)) * 1.0)).alias("violation_rate"),
        )
    )


# Chain blocks for the liftover gate: from nation, DISJOINT per contig by
# construction (per-contig stride 100000 vs block length 20000), each
# mapping to a renamed dst contig at a shifted origin.
_CHAIN_CTE = """
chain AS (
    SELECT n_nationkey % 4 AS src_contig,
           n_nationkey * 25000 + 1 AS src_start,
           n_nationkey * 25000 + 20000 AS src_stop,
           n_nationkey % 4 + 10 AS dst_contig,
           7000000 + n_nationkey * 1000 AS dst_start
    FROM nation
)
"""


def _chain_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    return n.select(
        (F.col("n_nationkey") % 4).cast("long").alias("src_contig"),
        (F.col("n_nationkey") * 25000 + 1).cast("long").alias("src_start"),
        (F.col("n_nationkey") * 25000 + 20000).cast("long").alias("src_stop"),
        (F.col("n_nationkey") % 4 + 10).cast("long").alias("dst_contig"),
        (F.lit(7000000) + F.col("n_nationkey") * 1000).cast("long").alias("dst_start"),
    )


@query(
    "interval_liftover_reads",
    oracle=f"""
        WITH {READS_CTE}, {_DISTINCT_READS_CTE}, {_CHAIN_CTE.lstrip()},
        pairs AS (
            SELECT r.qname, r.ref_idx, r.pos, r.stop, c.dst_contig,
                   c.dst_start + greatest(c.src_start, r.pos) - c.src_start
                       AS lift_start,
                   c.dst_start + least(c.src_stop, r.stop) - c.src_start
                       AS lift_stop,
                   least(c.src_stop, r.stop) - greatest(c.src_start, r.pos)
                       + 1 AS mapped
            FROM dreads r JOIN chain c
              ON r.ref_idx = c.src_contig
             AND r.pos <= c.src_stop AND c.src_start <= r.stop
        ),
        per AS (
            SELECT qname, ref_idx,
                   sum(mapped) / (max(stop) - max(pos) + 1.0) AS frac
            FROM pairs GROUP BY qname, ref_idx
        )
        SELECT p.dst_contig, count(*) AS n_segments,
               sum(p.lift_stop - p.lift_start + 1)::BIGINT AS lifted_bases,
               count(DISTINCT p.qname) AS n_reads,
               min(p.lift_start)::BIGINT AS min_pos,
               max(p.lift_stop)::BIGINT AS max_pos
        FROM pairs p JOIN per
          ON p.qname = per.qname AND p.ref_idx = per.ref_idx
        WHERE per.frac >= 0.5
        GROUP BY p.dst_contig
    """,
    doc="UCSC liftOver as a distributed operator (interval_liftover): reads "
    "remap through disjoint chain blocks — clip to block, shift by the "
    "block's source→dest offset, split on block boundaries, drop inputs "
    "below minMatch=0.5 mapped fraction. Plan: ONE binned tile join + one "
    "window totalling mapped bases per input row; the oracle recomputes "
    "the same remap relationally (join + clip arithmetic + a per-read "
    "fraction subquery) without the tile decomposition.",
)
def interval_liftover_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_liftover

    reads = _mapped_reads(spark, sf_dir)
    lifted = interval_liftover(
        reads, _chain_view(spark, sf_dir),
        keys=("ref_idx", "pos", "stop"),
        min_match=0.5,
    )
    return lifted.groupBy(F.col("ref_idx").alias("dst_contig")).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("stop") - F.col("pos") + 1).alias("lifted_bases"),
        F.count_distinct("qname").alias("n_reads"),
        F.min("pos").alias("min_pos"),
        F.max("stop").alias("max_pos"),
    )


@query(
    "pileup_depth_histogram",
    bench=True,
    oracle=f"""
        WITH {READS_CTE}, {REGIONS_CTE}, {_DISTINCT_READS_CTE},
        {_MERGED_REGIONS_CTE.lstrip()},
        pairs AS (
            SELECT r.ref_idx,
                   greatest(m.m_start, r.pos) AS cs,
                   least(m.m_stop, r.stop) AS ce
            FROM dreads r JOIN mregions m
              ON r.ref_idx = m.contig_idx
             AND r.pos <= m.m_stop AND m.m_start <= r.stop
        ),
        bases AS (
            SELECT ref_idx, unnest(generate_series(cs, ce)) AS p
            FROM pairs
        ),
        depths AS (
            SELECT ref_idx, p, count(*) AS depth
            FROM bases GROUP BY ref_idx, p
        )
        SELECT ref_idx, depth, count(*) AS n_positions
        FROM depths GROUP BY ref_idx, depth
    """,
    doc="samtools depth over target regions: per-base pileup depth inside "
    "the (merged) region set, reported as a per-contig depth histogram. "
    "Plan: binned tile join reads×merged-regions, then the BOUNDARY-EVENT "
    "sweep (the interval_multiinter form): each clipped read becomes a "
    "+1 event at its clipped start and a -1 at clipped stop + 1, the "
    "CHUNKED prefix scan (operators/sweep.py — local running sums per "
    "(contig, 8 Mb chunk) + chunk-granularity offsets, no per-contig "
    "window) gives the depth of every constant-depth segment, and the "
    "histogram weights each (contig, depth) by segment length — "
    "O(read boundaries) rows instead of O(covered bases) (at 30x "
    "whole-genome coverage a ~100x row reduction vs the per-base "
    "explode this replaced). The oracle stays per-base in DuckDB — "
    "exact divergence detection.",
)
def pileup_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import (
        interval_join_binned as _ijb,
        interval_merge,
    )
    from hadoop_bam_spark.operators.sweep import chunked_scan

    reads = _mapped_reads(spark, sf_dir)
    mr = interval_merge(
        regions_view(spark, sf_dir),
        keys=("contig_idx", "r_start", "r_stop"),
    ).select("contig_idx", "r_start", "r_stop")
    hits = _ijb(
        reads, mr,
        left_keys=("ref_idx", "pos", "stop"),
        right_keys=("contig_idx", "r_start", "r_stop"),
    )
    pairs = hits.select(
        "ref_idx",
        F.greatest(F.col("r_start"), F.col("pos")).alias("cs"),
        F.least(F.col("r_stop"), F.col("stop")).alias("ce"),
    )
    # map-side explode, not a union of two selects: a union prints (and
    # statically re-plans) the whole reads-join-merge subtree twice, and
    # the scan's summary branch would double THAT again
    ev = pairs.select(
        "ref_idx",
        F.explode(
            F.array(
                F.struct(F.col("cs").alias("p"), F.lit(1).alias("d")),
                F.struct((F.col("ce") + 1).alias("p"), F.lit(-1).alias("d")),
            )
        ).alias("_ev"),
    ).select("ref_idx", F.col("_ev.p").alias("p"), F.col("_ev.d").alias("d"))
    # Merged regions are disjoint, so depth returns to 0 between regions —
    # no segment ever spans a region boundary.
    # Running depth AND the next-boundary lookahead in ONE fused scan
    # (r15 — two separate passes before), with the one-row-per-boundary
    # position aggregate FUSED into the scan's own exchange (r18, guide
    # §2.4): the standalone groupBy(ref_idx, p) cost a second full
    # exchange of the event table immediately before the scan's
    # repartition — the fused form groups on (key, chunk, p) after that
    # one exchange instead (plans/r18: Exchange(29)+Exchange(31) → one).
    state = chunked_scan(
        ev,
        ["ref_idx"],
        "p",
        [("delta", "sum", "depth"), (F.col("p"), "min", "_nxt", "desc", True)],
        pre_agg=[F.sum("d").alias("delta")],
    )
    # The final event of a contig always carries depth 0 (deltas sum to 0),
    # so depth > 0 never coincides with a null lead.
    return (
        state.filter(F.col("depth") > 0)
        .groupBy("ref_idx", "depth")
        .agg(F.sum(F.col("_nxt") - F.col("p")).alias("n_positions"))
    )


@query(
    "coverage_outlier_bins",
    oracle=f"""
        WITH {READS_CTE}, {_DISTINCT_READS_CTE},
        binned AS (
            SELECT r.ref_idx,
                   unnest(generate_series((r.pos - 1) // 1000,
                                          (r.stop - 1) // 1000)) AS bin
            FROM dreads r
        ),
        depths AS (
            SELECT ref_idx, bin, count(*) AS depth
            FROM binned GROUP BY ref_idx, bin
        ),
        med AS (
            SELECT ref_idx, quantile_cont(depth, 0.5) AS median_depth
            FROM depths GROUP BY ref_idx
        )
        SELECT d.ref_idx, count(*) AS n_bins,
               min(m.median_depth) AS median_depth,
               sum(CASE WHEN d.depth > 2 * m.median_depth
                        THEN 1 ELSE 0 END)::BIGINT AS n_outlier_bins,
               max(d.depth)::BIGINT AS max_depth
        FROM depths d JOIN med m USING (ref_idx)
        GROUP BY d.ref_idx
    """,
    doc="Median-normalized coverage outlier screen (the first pass of any "
    "CNV/amplification caller): reads explode to 1 kb bins (the "
    "coverage_histogram shape), per-contig exact median bin depth, flag "
    "bins above 2× median. The per-contig medians are a 4-row aggregate "
    "broadcast back onto the bin table — no window over all bins, no "
    "second shuffle of the depth table. At 100 TB swap the exact "
    "percentile for percentile_approx (mergeable sketch); the exact form "
    "stays oracle-checkable (Spark percentile == DuckDB quantile_cont).",
)
def coverage_outlier_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = _mapped_reads(spark, sf_dir)
    depths = (
        reads.select(
            "ref_idx",
            F.explode(
                F.sequence(
                    ((F.col("pos") - 1) / 1000).cast("long"),
                    ((F.col("stop") - 1) / 1000).cast("long"),
                )
            ).alias("bin"),
        )
        .groupBy("ref_idx", "bin")
        .agg(F.count(F.lit(1)).alias("depth"))
    )
    med = depths.groupBy("ref_idx").agg(
        F.percentile("depth", F.lit(0.5)).alias("median_depth")
    )
    joined = depths.join(F.broadcast(med), on="ref_idx")
    return joined.groupBy("ref_idx").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.min("median_depth").alias("median_depth"),
        F.sum(
            F.when(F.col("depth") > 2 * F.col("median_depth"), 1).otherwise(0)
        ).alias("n_outlier_bins"),
        F.max("depth").alias("max_depth"),
    )


@query(
    "kmer_topk",
    oracle=f"""
        WITH {READS_CTE},
        seqs AS (
            SELECT translate(md5(qname), '0123456789abcdef',
                             'ACGTACGTACGTACGT') AS seq
            FROM reads
        ),
        kmers AS (
            SELECT substr(seq, i, 6) AS kmer
            FROM seqs, generate_series(1, 27) AS t(i)
        )
        SELECT kmer, count(*) AS n
        FROM kmers GROUP BY kmer
        ORDER BY n DESC, kmer ASC LIMIT 25
    """,
    doc="FastQC-style overrepresented k-mer scan: slide a 6-mer window "
    "over every read sequence (explode via sequence()+substring — JVM "
    "expressions, no UDF), count, global top-25 by TakeOrderedAndProject "
    "(no full sort). Scale shape: the k-mer space is bounded (4^6), so "
    "the count aggregation is map-side-combinable into at most 4096 "
    "groups per partition regardless of corpus size — the "
    "token_heavy_hitters shape with a hard cardinality cap.",
)
def kmer_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = reads_view(spark, sf_dir)
    seq = F.translate(F.md5(F.col("qname")), "0123456789abcdef", "ACGTACGTACGTACGT")
    # explode over a fixed 1..27 index array keeps it one generator node
    return (
        reads.select(seq.alias("_seq"))
        .select(F.explode(F.sequence(F.lit(1), F.lit(27))).alias("_i"), "_seq")
        .select(F.expr("substring(_seq, _i, 6)").alias("kmer"))
        .groupBy("kmer")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("kmer"))
        .limit(25)
    )


@query(
    "interval_multiinter_sets",
    bench=True,
    oracle=f"""
        WITH sa AS (
            SELECT n_nationkey % 4 AS contig,
                   (n_nationkey * 37561) % 900000 + 1 AS s,
                   (n_nationkey * 37561) % 900000 + 1
                       + 25000 + (n_nationkey % 5) * 10000 AS e
            FROM nation
        ), sb AS (
            SELECT p_partkey % 4 AS contig,
                   (p_partkey * 9173) % 950000 + 1 AS s,
                   (p_partkey * 9173) % 950000 + 2000 AS e
            FROM part
        ), sc AS (
            SELECT s_suppkey % 4 AS contig,
                   (s_suppkey * 52711) % 900000 + 1 AS s,
                   (s_suppkey * 52711) % 900000 + 40000 AS e
            FROM supplier
        ),
        bases AS (
            SELECT DISTINCT contig * {_AXIS}
                       + unnest(generate_series(s, e)) AS p,
                   'alpha' AS nm FROM sa
            UNION
            SELECT DISTINCT contig * {_AXIS}
                       + unnest(generate_series(s, e)), 'beta' FROM sb
            UNION
            SELECT DISTINCT contig * {_AXIS}
                       + unnest(generate_series(s, e)), 'gamma' FROM sc
        ),
        combos AS (
            SELECT p, string_agg(nm, ',' ORDER BY nm) AS set_list
            FROM bases GROUP BY p
        ),
        islands AS (
            SELECT set_list, p,
                   p - row_number() OVER (PARTITION BY set_list ORDER BY p)
                       AS isl
            FROM combos
        ),
        segs AS (
            SELECT set_list, count(*) AS seg_len
            FROM islands GROUP BY set_list, isl
        )
        SELECT set_list,
               (length(set_list) - length(replace(set_list, ',', '')) + 1)
                   ::BIGINT AS n_sets,
               count(*) AS n_segments,
               sum(seg_len)::BIGINT AS covered_bases
        FROM segs GROUP BY set_list
    """,
    doc="bedtools multiinter: partition the genome by WHICH of three "
    "interval sets cover it (operators/interval_join.py "
    "interval_multiinter — the event-point sweep on the CHUNKED prefix "
    "scan of operators/sweep.py: per-set running coverage counts as "
    "local scans per (contig, 8 Mb chunk) + chunk-summary offsets, no "
    "per-contig window; output bounded by 2x the merged-interval "
    "count, never per-base). The oracle IS per-base: explode every "
    "covered position, "
    "group into combination islands, and count maximal runs — a "
    "completely different construction that any sweep/tie bug diverges "
    "from.",
)
def interval_multiinter_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_multiinter

    def mk(table: str, key: str, mult: int, mod: int, length: int) -> DataFrame:
        t = _t(spark, sf_dir, table)
        start = (F.col(key) * mult) % mod + 1
        return t.select(
            (F.col(key) % 4).cast("long").alias("contig"),
            start.cast("long").alias("start"),
            (start + length).cast("long").alias("stop"),
        )

    a = regions_view(spark, sf_dir).select(
        F.col("contig_idx").alias("contig"),
        F.col("r_start").alias("start"),
        F.col("r_stop").alias("stop"),
    )
    b = mk("part", "p_partkey", 9173, 950000, 1999)
    c = mk("supplier", "s_suppkey", 52711, 900000, 39999)
    segs = interval_multiinter({"alpha": a, "beta": b, "gamma": c})
    return segs.groupBy("set_list").agg(
        F.max("n_sets").alias("n_sets"),
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("stop") - F.col("start") + 1).alias("covered_bases"),
    )


@query(
    "interval_cluster_regions",
    oracle=f"""
        WITH {REGIONS_CTE}, {_MERGED_REGIONS_CTE.lstrip()},
        member AS (
            SELECT m.contig_idx, m.m_start, count(*) AS sz
            FROM regions g JOIN mregions m
              ON g.contig_idx = m.contig_idx
             AND g.r_start BETWEEN m.m_start AND m.m_stop
            GROUP BY m.contig_idx, m.m_start
        )
        SELECT contig_idx, sum(sz)::BIGINT AS n_intervals,
               count(*) AS n_clusters, max(sz)::BIGINT AS max_cluster_size
        FROM member GROUP BY contig_idx
    """,
    doc="bedtools cluster: every region gets a cluster id (connected "
    "through overlap chains = same interval_merge run) WITHOUT "
    "collapsing rows — the same two-phase range-partitioned sweep as "
    "interval_merge, with ids joined back through the run map and the "
    "per-contig ordinal assigned over ONE row per final cluster. The "
    "oracle derives cluster "
    "membership by containment in the single-axis merged regions "
    "instead of running any id assignment.",
)
def interval_cluster_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import interval_cluster

    regions = regions_view(spark, sf_dir)
    clustered = interval_cluster(
        regions, keys=("contig_idx", "r_start", "r_stop"))
    per = clustered.groupBy("contig_idx", "cluster_id").agg(
        F.count(F.lit(1)).alias("sz"))
    return per.groupBy("contig_idx").agg(
        F.sum("sz").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_clusters"),
        F.max("sz").alias("max_cluster_size"),
    )


@query(
    "per_cycle_quality",
    oracle=f"""
        WITH quals AS (
            SELECT translate(md5(qname), '{_HEX}', '{_SANGER16}') AS q
            FROM (
                SELECT 'r' || l_orderkey::VARCHAR || '-'
                           || l_linenumber::VARCHAR AS qname
                FROM lineitem
            )
        ),
        cells AS (
            SELECT unnest(generate_series(1, 32)) AS cycle, q FROM quals
        )
        SELECT cycle::BIGINT AS cycle, count(*) AS n_reads,
               sum(ascii(substr(q, cycle, 1)) - 33)::BIGINT AS sum_phred,
               sum(ascii(substr(q, cycle, 1)) - 33)
                   / (count(*) * 1.0) AS mean_phred,
               min(ascii(substr(q, cycle, 1)) - 33)::BIGINT AS min_phred,
               max(ascii(substr(q, cycle, 1)) - 33)::BIGINT AS max_phred
        FROM cells GROUP BY cycle
    """,
    doc="FastQC per-base (per-cycle) quality profile: mean/min/max Phred "
    "score at each read cycle over deterministic 32-cycle Sanger-encoded "
    "quality strings. Pure explode + substring + ascii arithmetic "
    "(JVM-side, codegen) into a 32-group aggregation — fixed output "
    "cardinality, perfect map-side partial aggregation at any corpus "
    "size.",
)
def per_cycle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = reads_view(spark, sf_dir)
    q = F.translate(F.md5(F.col("qname")), _HEX, _SANGER16)
    cells = reads.select(q.alias("q")).select(
        F.explode(F.sequence(F.lit(1), F.lit(32))).alias("cycle"), "q"
    )
    phred = F.ascii(F.substring(F.col("q"), F.col("cycle").cast("int"), 1)) - 33
    per = cells.select("cycle", phred.alias("p"))
    return per.groupBy("cycle").agg(
        F.count(F.lit(1)).alias("n_reads"),
        F.sum("p").alias("sum_phred"),
        (F.sum("p") / (F.count(F.lit(1)) * 1.0)).alias("mean_phred"),
        F.min("p").alias("min_phred"),
        F.max("p").alias("max_phred"),
    )


@query(
    "template_pair_stats",
    oracle=f"""
        WITH {READS_CTE},
        mates AS (
            SELECT 'r' || l_orderkey::VARCHAR AS template, ref_idx,
                   min(CASE WHEN flag & 64 > 0 THEN pos END) AS pos1,
                   min(CASE WHEN flag & 128 > 0 THEN pos END) AS pos2,
                   max(CASE WHEN flag & 64 > 0 THEN stop END) AS stop1,
                   max(CASE WHEN flag & 128 > 0 THEN stop END) AS stop2,
                   count(*) AS n_reads
            FROM reads
            WHERE flag & 4 = 0
            GROUP BY 'r' || l_orderkey::VARCHAR, ref_idx
        )
        SELECT ref_idx,
               count(*) AS n_templates,
               sum(CASE WHEN pos1 IS NOT NULL AND pos2 IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS n_paired,
               sum(CASE WHEN pos1 IS NOT NULL AND pos2 IS NOT NULL
                        THEN greatest(stop1, stop2)
                             - least(pos1, pos2) + 1 END)::BIGINT
                   AS sum_template_span,
               max(n_reads)::BIGINT AS max_reads_per_template
        FROM mates GROUP BY ref_idx
    """,
    doc="Read-pair (template) resolution + insert-size-style span stats: "
    "group mapped reads by template name and contig, pull first/"
    "second-in-pair positions out of the SAM flag bits (64/128) with "
    "conditional aggregates — ONE groupBy on the natural high-cardinality "
    "template key, no self-join (the samtools-fixmate shape; flag "
    "semantics per SURVEY.md §1.3). Span = outermost mate extent, the "
    "TLEN definition.",
)
def template_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = reads_view(spark, sf_dir).filter(F.col("flag").bitwiseAND(4) == 0)
    tpl = F.concat(F.lit("r"), F.col("l_orderkey").cast("string"))
    first = F.col("flag").bitwiseAND(64) > 0
    second = F.col("flag").bitwiseAND(128) > 0
    mates = reads.groupBy(tpl.alias("template"), F.col("ref_idx")).agg(
        F.min(F.when(first, F.col("pos"))).alias("pos1"),
        F.min(F.when(second, F.col("pos"))).alias("pos2"),
        F.max(F.when(first, F.col("stop"))).alias("stop1"),
        F.max(F.when(second, F.col("stop"))).alias("stop2"),
        F.count(F.lit(1)).alias("n_reads"),
    )
    paired = F.col("pos1").isNotNull() & F.col("pos2").isNotNull()
    span = F.greatest("stop1", "stop2") - F.least("pos1", "pos2") + 1
    return mates.groupBy("ref_idx").agg(
        F.count(F.lit(1)).alias("n_templates"),
        F.sum(F.when(paired, 1).otherwise(0)).alias("n_paired"),
        F.sum(F.when(paired, span)).alias("sum_template_span"),
        F.max("n_reads").alias("max_reads_per_template"),
    )


@query(
    "interval_slop_merge",
    oracle=f"""
        WITH {REGIONS_CTE},
        sl AS (
            SELECT contig_idx,
                   contig_idx * {_AXIS} + greatest(r_start - 5000, 1) AS s2,
                   contig_idx * {_AXIS} + least(r_stop + 12000, 1100000)
                       AS e2,
                   region_id
            FROM regions
        ), sflag AS (
            SELECT contig_idx, s2, e2,
                   CASE WHEN max(e2) OVER (ORDER BY s2, e2, region_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) IS NULL
                         OR s2 > max(e2) OVER (ORDER BY s2, e2, region_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) + 1
                        THEN 1 ELSE 0 END AS opens
            FROM sl
        ), sgrp AS (
            SELECT contig_idx, s2, e2,
                   sum(opens) OVER (ORDER BY s2, e2
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS grp
            FROM sflag
        ), smerged AS (
            SELECT min(contig_idx) AS contig_idx,
                   min(s2) - min(contig_idx) * {_AXIS} AS m_start,
                   max(e2) - min(contig_idx) * {_AXIS} AS m_stop
            FROM sgrp GROUP BY grp
        )
        SELECT contig_idx, count(*) AS n_regions,
               sum(m_stop - m_start + 1)::BIGINT AS covered_bases,
               min(m_start)::BIGINT AS min_start,
               max(m_stop)::BIGINT AS max_stop
        FROM smerged GROUP BY contig_idx
    """,
    doc="bedtools slop + merge: grow every region 5 kb upstream / 12 kb "
    "downstream clamped to [1, contig size] (interval_slop — map-only "
    "arithmetic + a broadcast sizes join), then flatten the grown set "
    "(interval_merge) and report per-contig region counts and covered "
    "bases — the promoter/padding workflow every annotation pipeline "
    "runs. The oracle slops arithmetically and re-merges on the single "
    "axis.",
)
def interval_slop_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_bam_spark.operators.interval_join import (
        interval_merge,
        interval_slop,
    )

    regions = regions_view(spark, sf_dir).select(
        F.col("contig_idx").alias("contig"),
        F.col("r_start").alias("start"),
        F.col("r_stop").alias("stop"),
    )
    sizes = local_df(spark, 
        [(i, 1100000) for i in range(4)], "contig long, size long"
    )
    grown = interval_slop(regions, sizes, left=5000, right=12000)
    merged = interval_merge(grown)
    return merged.groupBy(F.col("contig").alias("contig_idx")).agg(
        F.count(F.lit(1)).alias("n_regions"),
        F.sum(F.col("stop") - F.col("start") + 1).alias("covered_bases"),
        F.min("start").alias("min_start"),
        F.max("stop").alias("max_stop"),
    )
