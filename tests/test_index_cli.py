"""CLI utilities (tools/index.py) — parity with the reference's standalone
mains (SplittingBAMIndexer/BGZFBlockIndexer/GetSortedBAMHeader/
SplittingBAMIndex.main, SURVEY.md §3.3)."""

import os

import pytest

from hadoop_bam_spark.tools.index import main

RES = "/root/reference/src/test/resources"
BAM = f"{RES}/test.bam"
VCF_BGZ = f"{RES}/test.vcf.bgz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BAM), reason="reference fixtures absent"
)


def test_sbi_build_and_stats(tmp_path, capsys):
    out = str(tmp_path / "t.sbi")
    assert main(["sbi", BAM, "-o", out, "-g", "2"]) == 0
    assert os.path.getsize(out) > 0
    assert main(["stats", out]) == 0
    text = capsys.readouterr().out
    assert "granularity 2" in text

    # the index must plan the same records the guesser finds: spot-check
    # that every recorded voffset decodes a record
    from hadoop_bam_spark.formats import bam as bam_codec
    from hadoop_bam_spark.formats import bgzf
    from hadoop_bam_spark.formats.splitting_index import SplittingIndex

    with open(out, "rb") as fh:
        idx = SplittingIndex.read(fh)
    with open(BAM, "rb") as fh:
        reader = bgzf.BGZFReader(fh)
        _, refs, _ = bam_codec.read_header(reader)
        for v in idx.voffsets:
            # ONE record per voffset ("a record starts exactly here") —
            # list() decoded the whole remaining file per voffset, making
            # the spot-check quadratic in index size (r18 suite budget).
            assert next(bam_codec.iter_records(reader, refs, v), None) is not None


def test_sbi_reference_layout(tmp_path):
    out = str(tmp_path / "t.splitting-bai")
    assert main(["sbi", BAM, "-o", out, "--reference-layout", "-g", "3"]) == 0
    from hadoop_bam_spark.formats.splitting_index import SplittingIndex

    with open(out, "rb") as fh:
        idx = SplittingIndex.read_reference_layout(fh, granularity=3)
    assert idx.voffsets
    assert idx.file_length == os.path.getsize(BAM)


def test_bai_matches_library_builder(tmp_path):
    out = str(tmp_path / "t.bai")
    assert main(["bai", BAM, "-o", out]) == 0
    from hadoop_bam_spark.formats.bai import build_bai, read_bai

    direct = build_bai(BAM)
    via_cli = read_bai(out)
    assert len(via_cli.refs) == len(direct.refs)
    for a, b in zip(via_cli.refs, direct.refs):
        assert a.bins == b.bins and a.linear == b.linear


def test_tbi_and_bgzfi(tmp_path, capsys):
    tbi = str(tmp_path / "t.tbi")
    assert main(["tbi", VCF_BGZ, "-o", tbi]) == 0
    assert main(["stats", tbi]) == 0

    bgzfi = str(tmp_path / "t.bgzfi")
    assert main(["bgzfi", VCF_BGZ, "-o", bgzfi, "-g", "1"]) == 0
    assert main(["stats", bgzfi]) == 0
    assert "offsets" in capsys.readouterr().out


def test_sorted_header_stamps_coordinate(tmp_path):
    out = str(tmp_path / "hdr.bam")
    assert main(["sorted-header", BAM, out]) == 0
    from hadoop_bam_spark.formats import bam as bam_codec
    from hadoop_bam_spark.formats import bgzf

    with open(out, "rb") as fh:
        reader = bgzf.BGZFReader(fh)
        header, refs, _ = bam_codec.read_header(reader)
    assert "SO:coordinate" in header.text


def test_guess_finds_first_record(capsys):
    assert main(["guess", BAM, "0"]) == 0
    assert "-> record at" in capsys.readouterr().out


def test_crai_and_csi_commands(tmp_path, capsys):
    from hadoop_bam_spark.formats import crai as crai_mod
    from hadoop_bam_spark.formats import csi as csi_mod

    # CSI over the fixture BAM (samtools index -c analog)
    out_csi = str(tmp_path / "b.csi")
    assert main(["csi", BAM, "-o", out_csi]) == 0
    assert "refs" in capsys.readouterr().out
    idx = csi_mod.read_csi(out_csi)
    assert idx.min_shift == 14 and idx.depth == 5

    # tabix-flavored CSI over the BGZF VCF
    out_vcsi = str(tmp_path / "v.csi")
    assert main(["csi", VCF_BGZ, "-o", out_vcsi]) == 0
    vidx = csi_mod.read_csi(out_vcsi)
    assert csi_mod.names_from_aux(vidx.aux)

    # CRAI over an engine-written CRAM
    from tests.test_crai import _header, _sorted_rows, _write_cram

    p = str(tmp_path / "c.cram")
    _write_cram(p, _sorted_rows(n=1200), _header(), per_container=300)
    import os

    os.unlink(p + ".crai")  # the helper writes one; rebuild via the CLI
    out_crai = str(tmp_path / "c.crai")
    assert main(["crai", p, "-o", out_crai]) == 0
    assert "containers" in capsys.readouterr().out
    assert crai_mod.read_crai(out_crai)

    # stats over both new formats
    assert main(["stats", out_crai]) == 0
    assert "entries" in capsys.readouterr().out
    assert main(["stats", out_vcsi]) == 0
    assert "sequences" in capsys.readouterr().out


def test_fai_command(tmp_path, capsys):
    p = str(tmp_path / "r.fa")
    with open(p, "w") as fh:
        fh.write(">c1\nACGTACGT\nACGT\n>c2\nTTTT\n")
    out = str(tmp_path / "r.fa.fai")
    assert main(["fai", p, "-o", out]) == 0
    assert "2 sequences" in capsys.readouterr().out
    with open(out) as fh:
        lines = [l.split("\t") for l in fh.read().splitlines()]
    assert lines[0][0] == "c1" and int(lines[0][1]) == 12
    assert lines[1][0] == "c2" and int(lines[1][1]) == 4


class TestCheckOracleArgs:
    """check_oracle CLI parsing: a misplaced --json or a typo'd query
    name must FAIL LOUDLY, never select zero queries and print a
    vacuous ALL OK (VERDICT r9 item 6)."""

    def test_json_flag_any_position(self, tmp_path):
        from hadoop_bam_spark.tools.check_oracle import parse_args

        d = str(tmp_path)
        assert parse_args(["--json", "o.json", d]) == ("o.json", d, set())
        assert parse_args([d, "--json", "o.json"]) == ("o.json", d, set())
        assert parse_args([d, "q1", "--json", "o.json", "q2"]) == (
            "o.json", d, {"q1", "q2"}
        )

    def test_dangling_json_flag(self, tmp_path):
        import pytest

        from hadoop_bam_spark.tools.check_oracle import parse_args

        with pytest.raises(SystemExit):
            parse_args([str(tmp_path), "--json"])

    def test_non_directory_sf_dir(self, tmp_path):
        import pytest

        from hadoop_bam_spark.tools.check_oracle import parse_args

        with pytest.raises(SystemExit):
            parse_args(["OUT.json", str(tmp_path)])  # flag forgotten

    def test_unknown_query_names_rejected(self, tmp_path):
        """Full-stack: unknown names exit non-zero before Spark spins
        up (the registry import is cheap; get_spark is not reached)."""
        import subprocess
        import sys

        r = subprocess.run(
            [sys.executable, "-m", "hadoop_bam_spark.tools.check_oracle",
             str(tmp_path), "definitely_not_a_query"],
            capture_output=True, text=True, timeout=120,
            cwd="/root/repo",
        )
        assert r.returncode != 0
        assert "unknown query name" in (r.stderr + r.stdout)


def test_idxstats_matches_record_scan(spark, tmp_path, capsys):
    """CLI idxstats (index-only) agrees with a full record scan of the
    same BAM, including the '*' no-coordinate line."""
    from pyspark.sql import functions as F

    from hadoop_bam_spark import sinks
    from hadoop_bam_spark.formats.sam import SAMHeader
    from hadoop_bam_spark.sources import register_all
    from hadoop_bam_spark.tools.index import main

    register_all(spark)
    hdr = SAMHeader()
    hdr.lines = ["@HD\tVN:1.6\tSO:coordinate"]
    for i in range(2):
        hdr.lines.append(f"@SQ\tSN:chr{i + 1}\tLN:100000")
        hdr.sequences[f"chr{i + 1}"] = (i, 100000)
    rows = []
    for i in range(300):
        if i % 7 == 0:
            rows.append((f"u{i}", 4, None, 0, 0, None, None, 0, 0,
                         None, None, {}))
        else:
            rows.append((f"r{i}", 0, f"chr{i % 2 + 1}", i * 10 + 1, 30,
                         "10M", None, 0, 0, None, None, {}))
    df = spark.createDataFrame(
        rows,
        "qname string, flag int, rname string, pos int, mapq int, "
        "cigar string, rnext string, pnext int, tlen int, seq string, "
        "qual string, tags map<string,string>",
    ).orderBy(F.col("rname").asc_nulls_last(), "pos")
    p = str(tmp_path / "x.bam")
    sinks.write_bam(df, p, hdr, index_bai=True)

    assert main(["idxstats", p]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    got = {f[0]: (int(f[1]), int(f[2]), int(f[3]))
           for f in (l.split("\t") for l in out)}
    back = spark.read.format("bam").load(p)
    per = {
        r["rname"]: r["n"]
        for r in back.groupBy("rname").agg(F.count("*").alias("n")).collect()
    }
    assert got["chr1"] == (100000, per["chr1"], 0)
    assert got["chr2"] == (100000, per["chr2"], 0)
    assert got["*"] == (0, 0, per[None])
