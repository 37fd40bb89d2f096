"""Source-side projection (SURVEY §2.3): ``option("columns", ...)`` prunes
the declared schema and skips decoding unselected fields — the engine's
analog of the reference's lazy decode (LazyBAMRecordFactory.java:53-111,
LazyParsingGenotypesContext.java:28-33). Every pruned read must equal the
full read's ``.select(...)`` of the same columns."""

import pytest
from pyspark.sql import functions as F

RES = "/root/reference/src/test/resources"


@pytest.fixture(scope="module")
def fmt_spark(spark):
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    return spark


def rows(df, *order):
    return sorted(map(tuple, df.select(*df.columns).collect()))


CASES = [
    ("bam", f"{RES}/test.bam", ["qname", "flag", "rname", "pos"], {}),
    ("sam", f"{RES}/test.sam", ["qname", "flag", "pos", "mapq"], {}),
    (
        "cram",
        f"{RES}/test.cram",
        ["qname", "flag", "rname", "pos"],
        {"reference": f"{RES}/auxf.fa"},
    ),
    ("sam_any", f"{RES}/misnamedBam.sam", ["qname", "rname", "pos"], {}),
    ("vcf", f"{RES}/test.vcf", ["contig", "start", "ref"], {}),
    ("vcf", f"{RES}/test.vcf.bgz", ["contig", "start", "alts"], {}),
    ("bcf", f"{RES}/test.bgzf.bcf", ["contig", "start", "ref"], {}),
    ("fasta", f"{RES}/auxf.fa", ["contig", "seq"], {}),
]


@pytest.mark.parametrize(
    "fmt,path,cols,opts",
    CASES,
    ids=[f"{f}-{p.rsplit('/', 1)[1]}" for f, p, _, _ in CASES],
)
def test_pruned_read_matches_full_select(fmt_spark, fmt, path, cols, opts):
    full = fmt_spark.read.format(fmt).options(**opts).load(path)
    pruned = (
        fmt_spark.read.format(fmt)
        .options(**opts)
        .option("columns", ",".join(cols))
        .load(path)
    )
    assert [f.name for f in pruned.schema.fields] == [
        f.name for f in full.schema.fields if f.name in set(cols)
    ]
    assert rows(pruned) == rows(full.select(*pruned.columns))


def test_fastq_pruned(fmt_spark, tmp_path):
    p = tmp_path / "r.fastq"
    p.write_text(
        "".join(
            f"@EAS139:7:FC706VJ:1:1:{i}:{i} 1:N:0:ATCACG\nACGTACGTAC\n+\n"
            f"IIIIIIIII{chr(33 + i % 60)}\n"
            for i in range(50)
        )
    )
    full = fmt_spark.read.format("fastq").load(str(p))
    pruned = (
        fmt_spark.read.format("fastq")
        .option("columns", "name,sequence")
        .load(str(p))
    )
    assert pruned.columns == ["name", "sequence"]
    assert rows(pruned) == rows(full.select("name", "sequence"))


def test_unknown_column_raises(fmt_spark):
    with pytest.raises(Exception, match="unknown columns"):
        (
            fmt_spark.read.format("bam")
            .option("columns", "qname,nope")
            .load(f"{RES}/test.bam")
            .count()
        )


def test_bam_interval_with_pruned_columns(fmt_spark):
    """Interval residual needs cigar internally; projection still drops it."""
    full = (
        fmt_spark.read.format("bam")
        .option("intervals", "1:1581001-1600000")
        .load(f"{RES}/test.bam")
    )
    pruned = (
        fmt_spark.read.format("bam")
        .option("intervals", "1:1581001-1600000")
        .option("columns", "qname,pos")
        .load(f"{RES}/test.bam")
    )
    assert pruned.columns == ["qname", "pos"]
    assert rows(pruned) == rows(full.select("qname", "pos"))
    assert pruned.count() > 0


def test_vcf_end_without_info(fmt_spark):
    """`end` is INFO-derived: pruning info but keeping end still parses END."""
    full = fmt_spark.read.format("vcf").load(f"{RES}/test.vcf")
    pruned = (
        fmt_spark.read.format("vcf")
        .option("columns", "contig,start,end")
        .load(f"{RES}/test.vcf")
    )
    assert pruned.columns == ["contig", "start", "end"]
    assert rows(pruned) == rows(full.select("contig", "start", "end"))


def test_bam_lazy_decode_skips_fields():
    """decode_record(wanted=...) returns None for skipped expensive fields
    and identical values for kept ones."""
    from hadoop_bam_spark.formats import bam, bgzf

    with open(f"{RES}/test.bam", "rb") as f:
        r = bgzf.BGZFReader(f)
        _, refs, first = bam.read_header(r)
        full_rows = list(bam.iter_records(r, refs, first))
    assert full_rows
    with open(f"{RES}/test.bam", "rb") as f:
        r = bgzf.BGZFReader(f)
        bam.read_header(r)
        r.seek_voffset(first)
        import struct

        lazy_rows = []
        while True:
            head = r.read(4)
            if len(head) < 4:
                break
            (n,) = struct.unpack("<i", head)
            body = r.read(n)
            lazy_rows.append(
                bam.decode_record(body, refs, frozenset({"qname", "flag", "pos"}))
            )
    for fr, lr in zip(full_rows, lazy_rows):
        assert lr[0] == fr[0] and lr[1] == fr[1] and lr[3] == fr[3]
        assert lr[5] is None and lr[9] is None and lr[10] is None and lr[11] is None
