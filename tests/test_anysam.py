"""AnySAM multi-format dispatch tests (reference TestAnySAMInputFormat:
mixed dirs and a BAM misnamed .sam must read via content sniff)."""

import os
import shutil

import pytest

from hadoop_bam_spark.sources.anysam_source import sniff_sam_format

REF_RES = "/root/reference/src/test/resources"
has_ref = os.path.isdir(REF_RES)


@pytest.mark.skipif(not has_ref, reason="reference fixtures absent")
def test_sniff_reference_fixtures():
    assert sniff_sam_format(os.path.join(REF_RES, "test.bam")) == "bam"
    assert sniff_sam_format(os.path.join(REF_RES, "test.sam")) == "sam"
    assert sniff_sam_format(os.path.join(REF_RES, "test.cram")) == "cram"
    # the headline case: BAM content, .sam name (TestAnySAMInputFormat)
    assert sniff_sam_format(os.path.join(REF_RES, "misnamedBam.sam")) == "bam"


@pytest.mark.skipif(not has_ref, reason="reference fixtures absent")
def test_misnamed_bam_reads_as_bam(spark, tmp_path):
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    # copy because the source looks for sidecar indexes next to the file
    p = str(tmp_path / "misnamedBam.sam")
    shutil.copyfile(os.path.join(REF_RES, "misnamedBam.sam"), p)
    rows = spark.read.format("sam_any").load(p).collect()
    assert len(rows) > 0
    assert all(r.qname for r in rows)


def test_mixed_dir_union(spark, tmp_path):
    from hadoop_bam_spark import sinks
    from hadoop_bam_spark.formats.sam import SAM_SCHEMA, SAMHeader
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    hdr = SAMHeader()
    hdr.lines = ["@HD\tVN:1.6", "@SQ\tSN:chr1\tLN:1000"]
    hdr.sequences = {"chr1": (0, 1000)}
    rows = [
        (f"r{i}", 0, "chr1", 10 * i + 1, 30, "4M", None, 0, 0, "ACGT", "IIII", {})
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, SAM_SCHEMA)
    d = tmp_path / "mixed"
    os.makedirs(d)
    sinks.write_any_sam(df.where("pos % 3 = 1"), str(d / "a.bam"), hdr)
    sinks.write_any_sam(df.where("pos % 3 = 2"), str(d / "b.sam"), hdr)
    sinks.write_any_sam(df.where("pos % 3 = 0"), str(d / "c.cram"), hdr)
    back = spark.read.format("sam_any").load(str(d))
    got = sorted((r.qname, r.pos) for r in back.collect())
    assert got == sorted((q, p) for q, _, _, p, *_ in rows)


def test_write_dispatch_by_extension(tmp_path):
    from hadoop_bam_spark import sinks

    with pytest.raises(ValueError):
        sinks.write_any_sam(None, str(tmp_path / "x.unknown"), None)
