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
