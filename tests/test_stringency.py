"""ValidationStringency tests (reference TestVCFInputFormatStringency:
STRICT raises on a malformed row, LENIENT warns+skips, SILENT skips)."""

import pytest


@pytest.fixture
def bad_vcf(tmp_path):
    p = tmp_path / "bad.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "1\t100\t.\tA\tT\t10\tPASS\tDP=3\n"
        "1\tnot_a_number\t.\tA\tT\t10\tPASS\tDP=3\n"
        "1\t300\tbroken\n"
        "1\t400\t.\tG\tC\t10\tPASS\tDP=5\n"
    )
    return str(p)


@pytest.fixture
def bad_sam(tmp_path):
    p = tmp_path / "bad.sam"
    p.write_text(
        "@HD\tVN:1.6\n"
        "@SQ\tSN:chr1\tLN:1000\n"
        "r1\t0\tchr1\t10\t30\t4M\t*\t0\t0\tACGT\tIIII\n"
        "truncated\tline\n"
        "r2\t0\tchr1\t20\t30\t4M\t*\t0\t0\tACGT\tIIII\n"
    )
    return str(p)


@pytest.fixture
def bad_fastq(tmp_path):
    p = tmp_path / "bad.fastq"
    p.write_text(
        "@r1\nACGT\n+\nIIII\n"
        "garbage-line\n"
        "@r2\nTTTT\n+\nJJJJ\n"
    )
    return str(p)


def _vcf_count(spark, path, stringency):
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    return (
        spark.read.format("vcf").option("stringency", stringency).load(path).count()
    )


def test_vcf_strict_raises(spark, bad_vcf):
    with pytest.raises(Exception, match="VCF line|invalid literal"):
        _vcf_count(spark, bad_vcf, "strict")


def test_vcf_lenient_and_silent_skip(spark, bad_vcf):
    assert _vcf_count(spark, bad_vcf, "lenient") == 2
    assert _vcf_count(spark, bad_vcf, "silent") == 2
    # htsjdk-style aliases accepted
    assert _vcf_count(spark, bad_vcf, "PERMISSIVE") == 2


def test_vcf_invalid_stringency_rejected():
    from hadoop_bam_spark.sources import stringency_option

    with pytest.raises(ValueError):
        stringency_option({"stringency": "whatever"})


def test_sam_stringency(spark, bad_sam):
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    with pytest.raises(Exception, match="SAM line"):
        spark.read.format("sam").load(bad_sam).count()
    got = (
        spark.read.format("sam").option("stringency", "silent").load(bad_sam)
    )
    assert sorted(r.qname for r in got.collect()) == ["r1", "r2"]


def test_fastq_stringency(spark, bad_fastq):
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    with pytest.raises(Exception, match="malformed FASTQ"):
        spark.read.format("fastq").load(bad_fastq).count()
    got = (
        spark.read.format("fastq").option("stringency", "lenient").load(bad_fastq)
    )
    assert sorted(r.name for r in got.collect()) == ["r1", "r2"]


def test_qseq_stringency(spark, tmp_path):
    from hadoop_bam_spark.sources import register_all

    p = tmp_path / "bad.qseq"
    good = "M1\t1\t1\t1\t5\t6\t0\t1\tACGT\thhhh\t1"
    p.write_text(good + "\nshort\tline\n" + good + "\n")
    register_all(spark)
    with pytest.raises(Exception, match="QSEQ line"):
        spark.read.format("qseq").load(str(p)).count()
    assert (
        spark.read.format("qseq").option("stringency", "silent").load(str(p)).count()
        == 2
    )
