"""BAI-based split calculation + .bgzfi block index tests (the last two
optional components of SURVEY §2.1/§2.2: reference BAMInputFormat.java:
333-477 and util/BGZFBlockIndexer.java:92-178)."""

import io

import pytest

from hadoop_bam_spark.formats import bgzf


def _make_bgzf(tmp_path, n_blocks=40):
    import random

    rng = random.Random(0)
    p = str(tmp_path / "t.bgz")
    with open(p, "wb") as f:
        w = bgzf.BGZFWriter(f, write_terminator=False)
        for _ in range(n_blocks):
            # incompressible payload so blocks stay ~5 KB compressed
            w.write(bytes(rng.randrange(256) for _ in range(5000)))
            w._flush_block(len(w._buf))  # one block per payload
        w.close()
    return p


def test_bgzfi_build_read_write(tmp_path):
    p = _make_bgzf(tmp_path)
    idx = bgzf.build_bgzfi(p, granularity=8)
    import os

    assert idx.file_size == os.path.getsize(p)
    assert len(idx.offsets) >= 2  # 0 + every 8th block
    buf = io.BytesIO()
    idx.write(buf)
    buf.seek(0)
    back = bgzf.BGZFBlockIndex.read(buf)
    assert back.offsets == idx.offsets
    assert back.file_size == idx.file_size
    # every indexed offset is a real block start
    with open(p, "rb") as fh:
        data = fh.read()
    for off in idx.offsets:
        assert bgzf.block_size_at(data, off) is not None


def test_bgzfi_aligned_splits_match_scanned_splits(tmp_path):
    p = _make_bgzf(tmp_path, n_blocks=64)
    import os

    size = os.path.getsize(p)
    idx = bgzf.build_bgzfi(p, granularity=1)  # every block indexed

    def read_range(path, start, length):
        with open(path, "rb") as fh:
            fh.seek(start)
            return fh.read(length)

    scanned = bgzf.align_splits(p, size, 4 * 5100, read_range)
    indexed = bgzf.align_splits_indexed(p, idx, 4 * 5100)
    assert [(s.start_coffset, s.end_coffset) for s in indexed] == [
        (s.start_coffset, s.end_coffset) for s in scanned
    ]
    assert len(indexed) > 4


def test_vcf_bgzfi_planning(spark, tmp_path):
    """A .vcf.bgz with a .bgzfi plans block-aligned splits by lookup and
    reads the same rows."""
    from hadoop_bam_spark import sinks
    from hadoop_bam_spark.formats.vcf import VCF_SCHEMA, VCFHeader
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    hdr = VCFHeader(
        lines=["##fileformat=VCFv4.2", "##contig=<ID=c1,length=10000000>"],
        samples=[],
    )
    rows = [
        ("c1", i * 100 + 1, i * 100 + 1, None, "A", ["T"], 1.0, ["PASS"],
         {"DP": str(i % 7)}, [])
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, VCF_SCHEMA).orderBy("start")
    path = str(tmp_path / "v.vcf.bgz")
    sinks.write_vcf(df, path, hdr)
    baseline = spark.read.format("vcf").option("split_size", "8192").load(path).count()

    idx = bgzf.build_bgzfi(path, granularity=1)
    with open(path + ".bgzfi", "wb") as f:
        idx.write(f)
    got = spark.read.format("vcf").option("split_size", "8192").load(path)
    assert got.rdd.getNumPartitions() > 1
    assert got.count() == baseline == 5000


def test_bai_based_split_calc(spark, tmp_path):
    """Coordinate-sorted BAM with only a .bai (no .sbi): planning snaps raw
    edges to linear-index voffsets — BAMPartitions, not raw ranges — and
    the record set is unchanged (reference BAMInputFormat.java:333-477)."""
    import os

    from hadoop_bam_spark import sinks
    from hadoop_bam_spark.formats.sam import SAM_SCHEMA, SAMHeader
    from hadoop_bam_spark.sources import register_all
    from hadoop_bam_spark.sources.bam_source import BAMPartition, BAMReader

    register_all(spark)
    hdr = SAMHeader()
    hdr.lines = ["@HD\tVN:1.6\tSO:coordinate", "@SQ\tSN:chr1\tLN:100000000"]
    hdr.sequences = {"chr1": (0, 100000000)}
    rows = [
        (f"r{i}", 0, "chr1", i * 20000 + 1, 30, "8M", None, 0, 0,
         "ACGTACGT", "IIIIIIII", {})
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, SAM_SCHEMA).coalesce(1)
    path = str(tmp_path / "x.bam")
    sinks.write_bam(df, path, hdr, index_granularity=64, index_bai=True)
    os.remove(path + ".sbi")

    reader = BAMReader({"path": path, "split_size": "8192"})
    parts = reader.partitions()
    assert len(parts) > 2
    assert all(isinstance(p, BAMPartition) for p in parts)  # not raw ranges
    got = sorted(
        r.qname for r in
        spark.read.format("bam").option("split_size", "8192").load(path).collect()
    )
    assert got == sorted(q for q, *_ in rows)
