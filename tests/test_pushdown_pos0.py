"""Synthesized-interval residual must keep coordinate-unset rows.

A bare ``.filter(col("contig") == ...)`` synthesizes a pruning interval at
pushFilters time; that interval also drives the row-level overlap residual
in the readers. Spec-legal rows with POS=0 (VCF telomeric variants — VCFv4.x
§5 "Telomeres are indicated by using positions 0 or N+1") or BAM records
with RNAME set but POS unset must NOT be dropped by it: the filter they
matched says nothing about position (ADVICE r4 medium finding)."""


def _write_vcf_pos0(path: str) -> None:
    lines = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=c1,length=100000>",
        "##contig=<ID=c2,length=100000>",
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "c1\t0\ttelo\tA\tT\t9\tPASS\tDP=3",  # telomeric POS=0
        "c1\t500\tv1\tG\tC\t9\tPASS\tDP=4",
        "c2\t700\tv2\tT\tA\t9\tPASS\tDP=5",
    ]
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_vcf_contig_filter_keeps_pos0(spark, tmp_path):
    from pyspark.sql import functions as F

    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    path = str(tmp_path / "telo.vcf")
    _write_vcf_pos0(path)
    df = spark.read.format("vcf").load(path).filter(F.col("contig") == "c1")
    ids = sorted(r.id for r in df.collect())
    assert ids == ["telo", "v1"], (
        "bare contig equality must keep the POS=0 telomeric row"
    )


def test_vcf_upper_bound_keeps_pos0(spark, tmp_path):
    from pyspark.sql import functions as F

    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    path = str(tmp_path / "telo2.vcf")
    _write_vcf_pos0(path)
    df = (
        spark.read.format("vcf")
        .load(path)
        .filter((F.col("contig") == "c1") & (F.col("start") < 600))
    )
    ids = sorted(r.id for r in df.collect())
    assert ids == ["telo", "v1"], (
        "upper-bound-only predicate admits POS=0; the synthesized interval "
        "must not install a [1, hi] floor"
    )


def test_bam_contig_filter_keeps_unset_pos(spark, tmp_path):
    """RNAME set, POS unset (-1 on the wire -> pos 0 in the 1-based view):
    `.filter(rname == ...)` must keep the record."""
    from pyspark.sql import functions as F

    from hadoop_bam_spark import sinks
    from hadoop_bam_spark.formats.sam import SAM_SCHEMA
    from hadoop_bam_spark.sources import register_all
    from tests.test_bai import _header

    register_all(spark)
    hdr = _header(n_refs=1, ln=100_000)
    rows = [
        # qname flag rname pos mapq cigar rnext pnext tlen seq qual tags
        ("r_unset", 4, "chr1", 0, 0, None, None, 0, 0, "ACGT", "IIII", None),
        ("r_plain", 0, "chr1", 1000, 60, "4M", None, 0, 0, "ACGT", "IIII", None),
    ]
    df = spark.createDataFrame(rows, SAM_SCHEMA)
    path = str(tmp_path / "unset.bam")
    sinks.write_bam(df, path, hdr)
    out = (
        spark.read.format("bam").load(path).filter(F.col("rname") == "chr1")
    )
    got = sorted(r.qname for r in out.collect())
    assert got == ["r_plain", "r_unset"]


def test_bcf_contig_filter_keeps_pos0(spark, tmp_path):
    from pyspark.sql import functions as F

    from hadoop_bam_spark import sinks
    from hadoop_bam_spark.formats.vcf import VCFHeader
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    src = str(tmp_path / "telo.vcf")
    _write_vcf_pos0(src)
    vdf = spark.read.format("vcf").load(src)
    hdr = VCFHeader()
    hdr.lines = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=c1,length=100000>",
        "##contig=<ID=c2,length=100000>",
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">',
    ]
    hdr.contigs = {"c1": 0, "c2": 1}
    bcf_path = str(tmp_path / "telo.bcf")
    sinks.write_bcf(vdf, bcf_path, hdr)
    out = (
        spark.read.format("vcf").load(bcf_path).filter(F.col("contig") == "c1")
    )
    ids = sorted(r.id for r in out.collect())
    assert ids == ["telo", "v1"]
