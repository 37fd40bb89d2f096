"""Foreign-provenance index parity.

Engine-built indexes are validated self-consistently elsewhere
(tests/test_bai.py, tests/test_tabix.py). These tests pin the OTHER
provenance direction: indexes and files written by htslib/htsjdk (shipped
in the reference tree's test resources) must drive our planner to exactly
the same records a brute-force scan+filter finds, and our own rebuilt
index over the same file must plan result-identical queries.
"""

from __future__ import annotations

import os

import pytest

RES = "/root/reference/src/test/resources"
HISEQ_BGZ = os.path.join(RES, "HiSeq.10000.vcf.bgz")
HISEQ_TBI = HISEQ_BGZ + ".tbi"
TEST_BAM = os.path.join(RES, "test.bam")

needs_hiseq = pytest.mark.skipif(
    not (os.path.exists(HISEQ_BGZ) and os.path.exists(HISEQ_TBI)),
    reason="reference fixtures absent",
)
needs_bam = pytest.mark.skipif(
    not os.path.exists(TEST_BAM), reason="reference fixtures absent"
)


@needs_hiseq
class TestHtslibTabix:
    """HiSeq.10000.vcf.bgz.tbi was written by htslib's tabix."""

    def test_htslib_tbi_parses(self):
        from hadoop_bam_spark.formats import tabix

        idx = tabix.read_tabix(HISEQ_TBI)
        assert idx.names  # contig dictionary present
        # every chunk voffset must be sane (coffset within the file)
        size = os.path.getsize(HISEQ_BGZ)
        for ref in idx.refs:
            for chunks in ref.bins.values():
                for beg, end in chunks:
                    assert 0 <= (beg >> 16) <= size
                    assert 0 <= (end >> 16) <= size

    def _records(self, spark, **opts):
        from hadoop_bam_spark.sources import register_all

        register_all(spark)
        r = spark.read.format("vcf").option("split_size", "65536")
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load(HISEQ_BGZ)

    @pytest.mark.parametrize(
        "interval",
        ["chr1:1-100000", "chr1:800000-900000", "chr1:240000000-250000000"],
    )
    def test_htslib_index_plans_match_full_scan(self, spark, interval):
        """Interval pushdown driven by the HTSLIB-written index must equal
        brute-force scan + filter (same overlap predicate)."""
        from pyspark.sql import functions as F

        contig, rng = interval.split(":")
        lo, hi = (int(x) for x in rng.split("-"))
        got = {
            (r.contig, r.start, r.id)
            for r in self._records(spark, intervals=interval).collect()
        }
        full = self._records(spark)
        want = {
            (r.contig, r.start, r.id)
            for r in full.filter(
                (F.col("contig") == contig)
                & (F.col("start") <= hi)
                & (F.col("end") >= lo)
            ).collect()
        }
        assert got == want

    def test_rebuilt_index_plans_same_results(self, spark, tmp_path):
        """Our own tabix build over the htslib-compressed file must plan the
        same query results as the htslib-written index."""
        import shutil

        from hadoop_bam_spark.formats import tabix

        # copy the data file; give it OUR index instead of htslib's
        p = str(tmp_path / "hiseq.vcf.bgz")
        shutil.copyfile(HISEQ_BGZ, p)
        tabix.write_tabix(tabix.build_tabix(p), p + ".tbi")

        from hadoop_bam_spark.sources import register_all

        register_all(spark)

        def q(path):
            return {
                (r.contig, r.start, r.id)
                for r in spark.read.format("vcf")
                .option("split_size", "65536")
                .option("intervals", "chr1:700000-1000000")
                .load(path)
                .collect()
            }

        assert q(p) == q(HISEQ_BGZ)

    def test_chunk_spans_cover_same_blocks(self):
        """Both provenances' chunk plans for one interval must cover the
        records region: our span may differ in merge granularity but the
        union of spans must overlap wherever htslib's does."""
        import shutil
        import tempfile

        from hadoop_bam_spark.formats import tabix

        ours_dir = tempfile.mkdtemp()
        p = os.path.join(ours_dir, "h.vcf.bgz")
        shutil.copyfile(HISEQ_BGZ, p)
        ours = tabix.build_tabix(p)
        theirs = tabix.read_tabix(HISEQ_TBI)
        for lo, hi in [(1, 100000), (500000, 600000)]:
            a = theirs.chunks_for("chr1", lo, hi)
            b = ours.chunks_for("chr1", lo, hi)
            if not a:
                continue
            # every htslib chunk must intersect our planned span envelope
            b_lo = min(x for x, _ in b)
            b_hi = max(y for _, y in b)
            for cb, ce in a:
                assert ce >= b_lo and cb <= b_hi


@needs_bam
class TestHtsjdkBamBai:
    """test.bam was written by htsjdk; build a .bai over it with the offline
    builder and verify index-driven traversal (no engine-written BAM in the
    loop)."""

    @pytest.fixture(scope="class")
    def htsjdk_bam_with_bai(self, tmp_path_factory):
        import shutil

        from hadoop_bam_spark.formats.bai import build_bai

        d = tmp_path_factory.mktemp("foreign")
        p = str(d / "test.bam")
        shutil.copyfile(TEST_BAM, p)
        idx = build_bai(p)
        with open(p + ".bai", "wb") as fh:
            idx.write(fh)
        return p

    def test_interval_traversal_matches_filter(self, spark, htsjdk_bam_with_bai):
        from pyspark.sql import functions as F

        from hadoop_bam_spark.formats.bam import cigar_ref_length
        from hadoop_bam_spark.sources import register_all

        register_all(spark)
        p = htsjdk_bam_with_bai
        full = spark.read.format("bam").load(p).collect()
        assert full  # fixture has records
        contig = next(r.rname for r in full if r.rname)
        lo, hi = 1, 50
        got = {
            (r.qname, r.flag, r.pos)
            for r in spark.read.format("bam")
            .option("intervals", f"{contig}:{lo}-{hi}")
            .load(p)
            .collect()
        }
        want = {
            (r.qname, r.flag, r.pos)
            for r in full
            if r.rname == contig
            and r.pos <= hi
            and r.pos + cigar_ref_length(r.cigar) - 1 >= lo
        }
        assert got == want

    def test_unmapped_traversal(self, spark, htsjdk_bam_with_bai):
        from hadoop_bam_spark.sources import register_all

        register_all(spark)
        p = htsjdk_bam_with_bai
        full = spark.read.format("bam").load(p).collect()
        got = {
            (r.qname, r.flag)
            for r in spark.read.format("bam")
            .option("unmapped", "true")
            .load(p)
            .collect()
        }
        want = {(r.qname, r.flag) for r in full if r.rname is None}
        assert got == want

    def test_bai_split_calc_on_htsjdk_file(self, htsjdk_bam_with_bai):
        """BAI-based split planning (no .sbi present) over an htsjdk-written
        BAM: split boundaries must be real record voffsets from the linear
        index, and the planned partitions must tile [header_end, EOF)."""
        from hadoop_bam_spark.sources.bam_source import BAMPartition, BAMReader

        p = htsjdk_bam_with_bai
        r = BAMReader({"path": p, "split_size": "1024"})
        parts = [x for x in r.partitions() if isinstance(x, BAMPartition)]
        assert parts, "expected BAI-driven voffset partitions"
        for a, b in zip(parts, parts[1:]):
            assert a.vend == b.vstart  # contiguous tiling
        # read every partition; row-count must equal the whole-file count
        n = 0
        for part in parts:
            for rb in r.read(part):
                n += rb.num_rows
        r2 = BAMReader({"path": p})
        m = sum(rb.num_rows for part in r2.partitions() for rb in r2.read(part))
        assert n == m


AUXF_FA = os.path.join(RES, "auxf.fa")
MINI_FA = os.path.join(RES, "mini-chr1-chr2.fasta")


@pytest.mark.skipif(
    not (os.path.exists(AUXF_FA) and os.path.exists(MINI_FA)),
    reason="reference fixtures absent",
)
class TestAutoFaidxExactness:
    """scan_fai_entries (the auto-faidx path for un-indexed FASTA,
    fasta_source.partitions) must reproduce htslib-written .fai sidecars
    byte-for-byte and handle malformed layouts per stringency
    (VERDICT r5 item 8)."""

    def _read_fai(self, path):
        with open(path) as fh:
            return [
                (f[0], int(f[1]), int(f[2]), int(f[3]), int(f[4]))
                for f in (l.rstrip("\n").split("\t") for l in fh if l.strip())
            ]

    def _brute_fai(self, path):
        """Independent (byte-walk, not line-split) faidx layout: name,
        length, offset of first base byte, bases per full line, bytes per
        full line. Kept deliberately different in shape from
        scan_fai_entries so the two cannot share a bug."""
        out, raw = [], open(path, "rb").read()
        pos = 0
        while pos < len(raw):
            assert raw[pos : pos + 1] == b">"
            nl = raw.index(b"\n", pos)
            name = raw[pos + 1 : nl].split()[0].decode()
            off = nl + 1
            # walk sequence lines until next '>' or EOF
            p, length, linebases, linewidth = off, 0, None, None
            while p < len(raw) and raw[p : p + 1] != b">":
                e = raw.find(b"\n", p)
                e = len(raw) if e < 0 else e
                bases = e - p - (1 if raw[e - 1 : e] == b"\r" else 0)
                if bases and linebases is None:
                    linebases, linewidth = bases, e + 1 - p
                length += bases
                p = e + 1
            out.append((name, length, off, linebases or 0, linewidth or 0))
            pos = p
        return out

    @pytest.mark.parametrize("fasta", [AUXF_FA, MINI_FA])
    def test_parity_with_htslib_fai(self, fasta):
        from hadoop_bam_spark.sinks import scan_fai_entries

        # AUXF_FA ships an htslib-written .fai — its absence means the
        # fixture path regressed, so fail loudly rather than skip (a
        # silent skip masked exactly that once; ADVICE r13). The
        # reference checkout stopped shipping MINI_FA's sidecar (r17), so
        # for fixtures without one the htslib file is replaced by an
        # independent brute-force layout walk.
        if os.path.exists(fasta + ".fai"):
            want = self._read_fai(fasta + ".fai")
        else:
            assert fasta != AUXF_FA, (
                f"{fasta}.fai sidecar missing — this fixture ships one; "
                "check the fixture path"
            )
            want = self._brute_fai(fasta)
        assert scan_fai_entries(fasta) == want

    def test_brute_fai_parity_with_htslib(self):
        """The brute-force fallback itself is parity-checked against the
        htslib-written sidecar that DOES ship (ADVICE r17: a fallback that
        replaces htslib parity must not be a home-grown walk nobody ever
        compared to htslib)."""
        assert self._brute_fai(AUXF_FA) == self._read_fai(AUXF_FA + ".fai")

    def test_crlf(self, tmp_path):
        """CRLF line endings: bases exclude the \\r (htslib parity),
        linewidth includes it, offsets count every byte."""
        from hadoop_bam_spark.sinks import scan_fai_entries

        p = tmp_path / "crlf.fa"
        p.write_bytes(b">c1\r\nACGTACGT\r\nACGT\r\n>c2\r\nGGGG\r\n")
        # c1: offset 5, 12 bases, 8/line, 10 bytes/line
        # c2: offset 5+10+6+5 = 26
        assert scan_fai_entries(str(p)) == [
            ("c1", 12, 5, 8, 10),
            ("c2", 4, 26, 4, 6),
        ]

    def test_final_line_without_newline(self, spark, tmp_path):
        from hadoop_bam_spark.sinks import scan_fai_entries
        from hadoop_bam_spark.sources import register_all

        p = tmp_path / "trunc.fa"
        p.write_bytes(b">c1\nACGT\nGG")
        assert scan_fai_entries(str(p)) == [("c1", 6, 4, 4, 5)]
        register_all(spark)
        rows = sorted(
            (r.contig, r.pos, r.seq)
            for r in spark.read.format("fasta").load(str(p)).collect()
        )
        assert rows == [("c1", 1, "ACGT"), ("c1", 5, "GG")]

    def test_mixed_line_widths_stringency(self, tmp_path):
        """A short line that is NOT a contig's last invalidates faidx
        arithmetic: strict raises (htslib refuses too), lenient/silent
        scan through with the first line's width."""
        import pytest as _pytest

        from hadoop_bam_spark.sinks import scan_fai_entries

        p = tmp_path / "mixed.fa"
        p.write_bytes(b">c1\nACGTACGT\nAC\nACGTACGT\n")
        with _pytest.raises(ValueError, match="different length"):
            scan_fai_entries(str(p))
        for mode in ("lenient", "silent"):
            got = scan_fai_entries(str(p), stringency=mode)
            assert got == [("c1", 18, 4, 8, 9)]
        # a short LAST line is legal (the normal faidx layout)
        ok = tmp_path / "ok.fa"
        ok.write_bytes(b">c1\nACGTACGT\nAC\n")
        assert scan_fai_entries(str(ok)) == [("c1", 10, 4, 8, 9)]

    def test_blank_line_inside_sequence_stringency(self, tmp_path):
        from hadoop_bam_spark.sinks import scan_fai_entries

        p = tmp_path / "blank.fa"
        p.write_bytes(b">c1\nACGT\n\nACGT\n")
        with pytest.raises(ValueError, match="blank line"):
            scan_fai_entries(str(p))
        assert scan_fai_entries(str(p), stringency="silent") == [
            ("c1", 8, 4, 4, 5)
        ]
        # trailing blank at EOF and blank between contigs are fine
        ok = tmp_path / "okb.fa"
        ok.write_bytes(b">c1\nACGT\n\n>c2\nGG\n\n")
        assert scan_fai_entries(str(ok)) == [
            ("c1", 4, 4, 4, 5),
            ("c2", 2, 14, 2, 3),
        ]

    def test_malformed_file_reads_but_persists_no_sidecar(self, spark, tmp_path):
        """Under lenient stringency the line-sequential reader stays exact
        on a mixed-width file, but NO .fai sidecar may be persisted (it
        would misseek any foreign faidx-arithmetic consumer)."""
        from hadoop_bam_spark.sources import register_all

        register_all(spark)
        p = tmp_path / "m.fa"
        p.write_bytes(b">c1\nACGTACGT\nAC\nACGTACGT\n")
        rows = sorted(
            (r.contig, r.pos, r.seq)
            for r in spark.read.format("fasta")
            .option("stringency", "lenient")
            .load(str(p))
            .collect()
        )
        assert rows == [
            ("c1", 1, "ACGTACGT"),
            ("c1", 9, "AC"),
            ("c1", 11, "ACGTACGT"),
        ]
        assert not os.path.exists(str(p) + ".fai")
        # a WELL-FORMED file persists its sidecar for future runs
        ok = tmp_path / "w.fa"
        ok.write_bytes(b">c1\nACGT\nGG\n")
        spark.read.format("fasta").load(str(ok)).collect()
        assert os.path.exists(str(ok) + ".fai")


class TestForeignFixtureBreadth:
    """Every reference-tree fixture file (src/test/resources/README
    recipes: bgzip/bcftools/gzip over the HiSeq and test VCFs) reads
    end-to-end through the matching Spark source. The .bgzf.gz variants
    are BGZF streams DISGUISED by a .gz extension — the magic-sniff
    path must still plan splittable scans and use the htslib-written
    sidecar .tbi."""

    def _count(self, spark, path, **opts):
        from hadoop_bam_spark.sources import register_all

        register_all(spark)
        r = spark.read.format("vcf")
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load(path).count()

    @pytest.mark.parametrize("name", [
        "HiSeq.10000.vcf",
        "HiSeq.10000.vcf.bgz",
        "HiSeq.10000.vcf.bgzf.gz",
        "HiSeq.10000.vcf.gz",
    ])
    def test_hiseq_variants_full_parity(self, spark, name):
        p = os.path.join(RES, name)
        if not os.path.exists(p):
            pytest.skip("reference fixtures absent")
        # 9,965 data records in the plain file; every compressed
        # variant must deliver exactly the same count
        assert self._count(spark, p) == 9965

    @pytest.mark.parametrize("name", [
        "test.vcf", "test.vcf.bgz", "test.vcf.bgzf.gz", "test.vcf.gz",
    ])
    def test_testvcf_variants_full_parity(self, spark, name):
        p = os.path.join(RES, name)
        if not os.path.exists(p):
            pytest.skip("reference fixtures absent")
        assert self._count(spark, p) == 5

    def test_bgzf_disguised_gz_uses_htslib_tbi(self, spark):
        """Interval pushdown through HiSeq.10000.vcf.bgzf.gz.tbi (the
        README copies the .bgz .tbi): same records as a residual filter
        over the full scan."""
        p = os.path.join(RES, "HiSeq.10000.vcf.bgzf.gz")
        if not (os.path.exists(p) and os.path.exists(p + ".tbi")):
            pytest.skip("reference fixtures absent")
        from hadoop_bam_spark.sources import register_all

        register_all(spark)
        full = (spark.read.format("vcf").load(p)
                .filter("contig = 'chr1' AND start <= 900000 "
                        "AND 800000 <= `end`").count())
        pushed = self._count(spark, p, intervals="chr1:800000-900000")
        assert pushed == full > 0

    def test_invalid_info_field_stringency(self, spark):
        """Reference TestVCFInputFormatStringency parity on its own
        fixture: one of the 5 records carries whitespace inside INFO —
        STRICT raises, LENIENT and SILENT deliver exactly 4."""
        p = os.path.join(RES, "invalid_info_field.vcf")
        if not os.path.exists(p):
            pytest.skip("reference fixtures absent")
        with pytest.raises(Exception, match="INFO"):
            self._count(spark, p, stringency="strict")
        assert self._count(spark, p, stringency="lenient") == 4
        assert self._count(spark, p, stringency="silent") == 4
