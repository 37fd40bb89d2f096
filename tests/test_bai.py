"""BAI binning index: build / binary round-trip / interval chunk queries /
index-driven split pruning and unplaced-unmapped traversal through the BAM
source (mirrors the reference's TestBAMInputFormat.java:143-216 bounded
traversal cases)."""

import io
import os
import random

import pytest

from hadoop_bam_spark.formats import bai, bam, bgzf
from hadoop_bam_spark.formats.sam import SAMHeader


def _header(n_refs=2, ln=100_000_000):
    hdr = SAMHeader()
    hdr.lines = ["@HD\tVN:1.6\tSO:coordinate"]
    for i in range(n_refs):
        hdr.lines.append(f"@SQ\tSN:chr{i + 1}\tLN:{ln}")
        hdr.sequences[f"chr{i + 1}"] = (i, ln)
    return hdr


def _row(qname, rname, pos, flag=0, seq="ACGT"):
    cigar = f"{len(seq)}M" if rname else None
    return (
        qname, flag, rname, pos, 30, cigar, None, 0, 0,
        seq, "I" * len(seq), None,
    )


def _make_bam(path, rows, hdr):
    with open(path, "wb") as f:
        bam.write_bam(f, hdr, rows)


def _sorted_rows(n=20000, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        contig = f"chr{rng.randint(1, 2)}"
        pos = rng.randint(1, 5_000_000)
        rows.append(_row(f"q{i}", contig, pos))
    rows.sort(key=lambda r: (r[2], r[3]))
    # unplaced unmapped tail (rname None, flag 4)
    for i in range(25):
        rows.append(_row(f"u{i}", None, 0, flag=4))
    return rows


class TestBAIFormat:
    def test_binary_roundtrip(self, tmp_path):
        p = str(tmp_path / "t.bam")
        _make_bam(p, _sorted_rows(), _header())
        idx = bai.build_bai(p)
        buf = io.BytesIO()
        idx.write(buf)
        buf.seek(0)
        idx2 = bai.BAIIndex.read(buf)
        assert len(idx2.refs) == len(idx.refs)
        assert idx2.n_no_coor == idx.n_no_coor == 25
        for a, b in zip(idx.refs, idx2.refs):
            assert a.bins == b.bins
            assert a.linear == b.linear
            assert (a.n_mapped, a.n_unmapped) == (b.n_mapped, b.n_unmapped)

    def test_chunks_cover_interval_records(self, tmp_path):
        """Every record overlapping the interval must live inside the chunk
        spans the index returns (no false negatives)."""
        p = str(tmp_path / "t.bam")
        rows = _sorted_rows()
        _make_bam(p, rows, _header())
        idx = bai.build_bai(p)
        beg0, end0 = 1_000_000, 1_200_000
        spans = idx.chunks_for(0, beg0, end0)
        assert spans
        # walk the file, record voffsets of chr1 records overlapping
        with open(p, "rb") as fh:
            r = bgzf.BGZFReader(fh)
            _, refs, _ = bam.read_header(r)
            import struct as _s

            while True:
                at = r.tell_voffset()
                head = r.read(4)
                if len(head) < 4:
                    break
                (sz,) = _s.unpack("<i", head)
                body = r.read(sz)
                ref_id, pos0 = _s.unpack_from("<ii", body, 0)
                if ref_id == 0 and pos0 < end0 and pos0 + 4 > beg0:
                    assert any(b <= at < e for b, e in spans), hex(at)

    def test_reg2bins_contains_reg2bin(self):
        for beg, end in [(0, 1), (100, 200), (16383, 16385), (1 << 20, (1 << 20) + 50),
                         (0, 1 << 29), (123456789, 123456790)]:
            assert bam.reg2bin(beg, end) in bai.reg2bins(beg, end)


@pytest.fixture(scope="module")
def indexed_bam(tmp_path_factory):
    d = tmp_path_factory.mktemp("bai_bam")
    p = str(d / "t.bam")
    rows = _sorted_rows()
    _make_bam(p, rows, _header())
    with open(p + ".bai", "wb") as f:
        bai.build_bai(p).write(f)
    return p, rows


class TestBAMSourceIntervalPushdown:
    SPLIT = 8 * 1024

    def _read(self, spark, path, **opts):
        from hadoop_bam_spark.sources import register_all

        register_all(spark)
        r = spark.read.format("bam").option("split_size", str(self.SPLIT))
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load(path)

    def test_interval_results_match_full_scan_filter(self, spark, indexed_bam):
        path, rows = indexed_bam
        df = self._read(spark, path, intervals="chr1:1000000-1200000")
        got = sorted(r.qname for r in df.collect())
        want = sorted(
            r[0]
            for r in rows
            if r[2] == "chr1" and r[3] <= 1_200_000 and r[3] + 3 >= 1_000_000
        )
        assert got == want

    def test_index_prunes_partitions(self, spark, indexed_bam):
        """A narrow interval must plan strictly fewer partitions than the
        full scan (the whole point of index pushdown)."""
        path, _ = indexed_bam
        full = self._read(spark, path).rdd.getNumPartitions()
        pruned = self._read(
            spark, path, intervals="chr1:1000000-1010000"
        ).rdd.getNumPartitions()
        assert full > 2
        assert pruned < full

    def test_unmapped_only(self, spark, indexed_bam):
        path, rows = indexed_bam
        df = self._read(spark, path, unmapped="true")
        got = sorted(r.qname for r in df.collect())
        assert got == sorted(r[0] for r in rows if r[2] is None)

    def test_unmapped_plus_intervals(self, spark, indexed_bam):
        path, rows = indexed_bam
        df = self._read(
            spark, path, intervals="chr2:1-100000", unmapped="true"
        )
        got = sorted(r.qname for r in df.collect())
        want = sorted(
            [r[0] for r in rows if r[2] is None]
            + [
                r[0]
                for r in rows
                if r[2] == "chr2" and r[3] <= 100_000 and r[3] + 3 >= 1
            ]
        )
        assert got == want

    def test_unmapped_scan_is_tail_only(self, spark, indexed_bam):
        """Unmapped traversal must start at the last linear bin, not scan
        the whole file: its partition count stays far below the full plan."""
        path, _ = indexed_bam
        full = self._read(spark, path).rdd.getNumPartitions()
        unm = self._read(spark, path, unmapped="true").rdd.getNumPartitions()
        assert unm < full
