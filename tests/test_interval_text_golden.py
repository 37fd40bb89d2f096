"""Golden spec fixtures for the interval-text family (r13 VERDICT task 6).

The cram3 golden fixture caught a real interop bug by hand-assembling a
file the engine never wrote; these do the same for chain, GFF3 and
bedGraph: each file below is typed out from the public spec's own
conventions (UCSC chain help page, the Sequence Ontology GFF3 spec's
canonical EDEN gene model, the UCSC bedGraph track example shape), and
every expected row is DERIVED BY HAND in comments — never by running the
engine's own writer, so a shared encode/decode bug cannot self-verify.
"""

import os

import pytest

pytestmark = []


# ---------------------------------------------------------------------------
# chain — mixed ± strand, gapped blocks (spec: genome.ucsc.edu chain help)
# ---------------------------------------------------------------------------

# Minus-strand chain, 4 blocks with dt/dq gaps. Hand walk (0-based
# half-open header coords; q counts on the '-' strand of a 151006098 bp
# chromosome, so the plus-strand low of a block starting at q is
# qSize - (q + size)):
#   t=25985403 q=43257292
#   B1 size 9  dt 1  dq 0 : src [25985404..25985412]
#        p_lo0 = 151006098-(43257292+9)  = 107748797 -> dst 107748798
#        t->25985413  q->43257301
#   B2 size 10 dt 0  dq 5 : src [25985414..25985423]
#        p_lo0 = 151006098-(43257301+10) = 107748787 -> dst 107748788
#        t->25985423  q->43257316
#   B3 size 61 dt 100 dq 0: src [25985424..25985484]
#        p_lo0 = 151006098-(43257316+61) = 107748721 -> dst 107748722
#        t->25985584  q->43257377
#   B4 size 54 (terminal) : src [25985585..25985638]
#        p_lo0 = 151006098-(43257377+54) = 107748667 -> dst 107748668
#        ends exactly at tEnd 25985638 / qEnd 43257431
_CHAIN_MINUS = """chain 4900 chrY 58368225 + 25985403 25985638 chr5 151006098 - 43257292 43257431 1
9 1 0
10 0 5
61 100 0
54

"""

# Plus-strand chain, 3 blocks. Hand walk: t=100 q=1000;
#   B1 size 50 dt 10 dq 20: src [101..150] dst 1001; t->160 q->1070
#   B2 size 40 dt 0  dq 30: src [161..200] dst 1071; t->200 q->1140
#   B3 size 50 (terminal) : src [201..250] dst 1141; qEnd = 1190
_CHAIN_PLUS = """chain 1000 chr21 46709983 + 100 250 chr20 64444167 + 1000 1190 2
50 10 20
40 0 30
50
"""

_CHAIN_WANT = [
    ("chrY", 25985404, 25985412, "chr5", 107748798, "-", 1, 4900),
    ("chrY", 25985414, 25985423, "chr5", 107748788, "-", 1, 4900),
    ("chrY", 25985424, 25985484, "chr5", 107748722, "-", 1, 4900),
    ("chrY", 25985585, 25985638, "chr5", 107748668, "-", 1, 4900),
    ("chr21", 101, 150, "chr20", 1001, "+", 2, 1000),
    ("chr21", 161, 200, "chr20", 1071, "+", 2, 1000),
    ("chr21", 201, 250, "chr20", 1141, "+", 2, 1000),
]


def test_chain_golden_parse():
    from hadoop_bam_spark.formats.chain import parse_chain

    assert parse_chain(_CHAIN_MINUS + _CHAIN_PLUS) == _CHAIN_WANT


def test_chain_golden_liftover_mirror(spark):
    """One hand-derived position through the minus chain: src position
    25985404 (block B1 offset 0) lies at the HIGH end of the lifted
    plus-strand block — p_hi = 107748798 + (9-1) = 107748806 — and the
    whole of B1 maps to [107748798, 107748806] reversed."""
    from hadoop_bam_spark.formats.chain import parse_chain
    from hadoop_bam_spark.operators.interval_join import interval_liftover

    chain = spark.createDataFrame(
        parse_chain(_CHAIN_MINUS),
        "src_contig string, src_start long, src_stop long, dst_contig string,"
        " dst_start long, dst_strand string, chain_id long, score long",
    )
    iv = spark.createDataFrame(
        [("chrY", 25985404, 25985404), ("chrY", 25985404, 25985412)],
        "contig string, start long, stop long",
    )
    got = sorted(
        (r["contig"], r["start"], r["stop"], r["dst_strand"])
        for r in interval_liftover(iv, chain, strand_col="dst_strand").collect()
    )
    assert got == [
        ("chr5", 107748798, 107748806, "-"),
        ("chr5", 107748806, 107748806, "-"),
    ]


def test_chain_golden_file_roundtrip(spark, tmp_path):
    from hadoop_bam_spark.formats.chain import read_chain

    p = tmp_path / "golden.chain"
    p.write_text(_CHAIN_MINUS + _CHAIN_PLUS)
    rows = [tuple(r) for r in read_chain(spark, str(p)).collect()]
    assert sorted(rows) == sorted(_CHAIN_WANT)


# ---------------------------------------------------------------------------
# GFF3 — the spec's canonical EDEN gene model shapes: directives,
# multi-parent attribute values, CDS phases, percent escapes kept raw
# (spec: github.com/The-Sequence-Ontology/Specifications gff3.md)
# ---------------------------------------------------------------------------

_GFF = "\n".join(
    [
        "##gff-version 3",
        "##sequence-region ctg123 1 1497228",
        "ctg123\t.\tgene\t1000\t9000\t.\t+\t.\tID=gene00001;Name=EDEN",
        "ctg123\t.\tTF_binding_site\t1000\t1012\t.\t+\t.\tID=tfbs00001;Parent=gene00001",
        "ctg123\t.\tmRNA\t1050\t9000\t.\t+\t.\tID=mRNA00001;Parent=gene00001;Name=EDEN.1",
        # one exon shared by two transcripts: multi-value Parent stays ONE
        # raw comma-joined value (the spec's own representation)
        "ctg123\t.\texon\t1300\t1500\t.\t+\t.\tID=exon00002;Parent=mRNA00001,mRNA00002",
        "ctg123\t.\tCDS\t1201\t1500\t.\t+\t0\tID=cds00001;Parent=mRNA00001;Name=edenprotein.1",
        "ctg123\t.\tCDS\t3000\t3902\t.\t+\t2\tID=cds00001;Parent=mRNA00001",
        # percent escapes (%3B = ';', %09 = tab, %2C = ',') must stay RAW —
        # decoding would break byte-exact round-trips
        "ctg123\ttestsrc\tmisc_feature\t2000\t2100\t5.5\t-\t.\tNote=has%3Bsemicolon and%09tab;Dbxref=NCBI:x%2Cy",
        "",
    ]
)

_GFF_WANT = [
    ("ctg123", None, "gene", 1000, 9000, None, "+", None,
     {"ID": "gene00001", "Name": "EDEN"}),
    ("ctg123", None, "TF_binding_site", 1000, 1012, None, "+", None,
     {"ID": "tfbs00001", "Parent": "gene00001"}),
    ("ctg123", None, "mRNA", 1050, 9000, None, "+", None,
     {"ID": "mRNA00001", "Parent": "gene00001", "Name": "EDEN.1"}),
    ("ctg123", None, "exon", 1300, 1500, None, "+", None,
     {"ID": "exon00002", "Parent": "mRNA00001,mRNA00002"}),
    ("ctg123", None, "CDS", 1201, 1500, None, "+", 0,
     {"ID": "cds00001", "Parent": "mRNA00001", "Name": "edenprotein.1"}),
    ("ctg123", None, "CDS", 3000, 3902, None, "+", 2,
     {"ID": "cds00001", "Parent": "mRNA00001"}),
    ("ctg123", "testsrc", "misc_feature", 2000, 2100, 5.5, "-", None,
     {"Note": "has%3Bsemicolon and%09tab", "Dbxref": "NCBI:x%2Cy"}),
]


def test_gff3_golden_scalar_parse():
    from hadoop_bam_spark.formats.gff import parse_gff_line

    got = [
        t for t in (parse_gff_line(l) for l in _GFF.splitlines()) if t is not None
    ]
    assert got == _GFF_WANT


def test_gff3_golden_source_scan(spark, tmp_path):
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    p = tmp_path / "eden.gff3"
    p.write_text(_GFF)
    rows = (
        spark.read.format("gff").load(str(p))
        .orderBy("start", "type")
        .collect()
    )
    got = [
        (r["contig"], r["source"], r["type"], r["start"], r["end"],
         r["score"], r["strand"], r["phase"], dict(r["attributes"]))
        for r in rows
    ]
    assert sorted(got, key=str) == sorted(_GFF_WANT, key=str)


# ---------------------------------------------------------------------------
# bedGraph — UCSC track/browser header tolerance, space separation
# (spec: genome.ucsc.edu bedGraph help; the example track's shape)
# ---------------------------------------------------------------------------

_BEDGRAPH = "\n".join(
    [
        "browser position chr19:49302001-49304701",
        'track type=bedGraph name="BedGraph Format" description="BedGraph format"'
        " visibility=full color=200,100,0 altColor=0,100,200 priority=20",
        # the spec's example data shape: 300-bp windows, -1.0 .. 1.0 in
        # 0.25 steps, SPACE separated (the spec allows space or tab)
        "chr19 49302000 49302300 -1.0",
        "chr19 49302300 49302600 -0.75",
        "chr19 49302600 49302900 -0.50",
        "chr19 49302900 49303200 -0.25",
        "chr19 49303200 49303500 0.0",
        "chr19 49303500 49303800 0.25",
        "chr19 49303800 49304100 0.50",
        "chr19 49304100 49304400 0.75",
        "chr19 49304400 49304700 1.00",
        "",
    ]
)

# 0-based half-open on disk -> 1-based closed in the engine.
_BEDGRAPH_WANT = [
    ("chr19", 49302000 + 300 * i + 1, 49302300 + 300 * i, -1.0 + 0.25 * i)
    for i in range(9)
]


def test_bedgraph_golden_scalar_parse():
    from hadoop_bam_spark.formats.bedgraph import parse_bedgraph_line

    got = [
        t
        for t in (parse_bedgraph_line(l) for l in _BEDGRAPH.splitlines())
        if t is not None
    ]
    assert got == _BEDGRAPH_WANT


def test_bedgraph_golden_source_scan(spark, tmp_path):
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    p = tmp_path / "ucsc.bedgraph"
    p.write_text(_BEDGRAPH)
    rows = spark.read.format("bedgraph").load(str(p)).orderBy("start").collect()
    got = [(r["contig"], r["start"], r["end"], r["value"]) for r in rows]
    assert got == _BEDGRAPH_WANT
