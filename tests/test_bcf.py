"""BCF2 codec + source tests against the reference golden files
(/root/reference/src/test/resources/test.uncompressed.bcf, test.bgzf.bcf —
same records as test.vcf; reference test analog TestBCFRecordReader)."""

import io
import os

import pytest

from hadoop_bam_spark.formats import bcf, bgzf
from hadoop_bam_spark.formats.vcf import parse_vcf_line, read_vcf_header
from hadoop_bam_spark.sources import bcf_source

RES = "/root/reference/src/test/resources"
PLAIN = os.path.join(RES, "test.uncompressed.bcf")
BGZF = os.path.join(RES, "test.bgzf.bcf")
TEXT = os.path.join(RES, "test.vcf")


def _decode_all(path=PLAIN):
    raw = open(path, "rb").read()
    hdr, off = bcf.read_bcf_header(io.BytesIO(raw))
    rows = []
    while off < len(raw):
        row, off = bcf.decode_record(raw, off, hdr)
        rows.append(row)
    return hdr, rows


class TestBCFCodec:
    def test_header_dictionaries(self):
        hdr, _ = _decode_all()
        assert hdr.vcf.samples == ["NA00001", "NA00002", "NA00003"]
        assert hdr.contigs == ["20"]
        assert hdr.strings[0] == "PASS"
        assert {"NS", "DP", "GT", "GQ", "HQ"} <= set(hdr.strings)

    def test_golden_matches_text_vcf(self):
        """BCF decode == text VCF parse, field for field (qual approx —
        float32 vs decimal text)."""
        _, rows = _decode_all()
        vh = read_vcf_header(TEXT)
        trows = [
            t
            for line in open(TEXT)
            if (t := parse_vcf_line(line, vh.samples)) is not None
        ]
        assert len(rows) == len(trows) == 5
        for b, t in zip(rows, trows):
            assert b[0] == t[0] and b[1] == t[1]  # contig, pos
            assert b[3] == t[3] and b[4] == t[4] and b[5] == t[5]
            if t[6] is None:
                assert b[6] is None
            else:
                assert b[6] == pytest.approx(t[6], abs=1e-4)
            assert b[7] == t[7]  # filters
            assert b[8] == t[8]  # info map
            assert b[9] == t[9]  # genotypes incl. GT phasing

    def test_encode_roundtrip(self):
        hdr, rows = _decode_all()
        blob = b"".join(bcf.encode_record(r, hdr) for r in rows)
        off, back = 0, []
        while off < len(blob):
            row, off = bcf.decode_record(blob, off, hdr)
            back.append(row)
        assert back == rows

    def test_header_encode_roundtrip(self):
        hdr, _ = _decode_all()
        blob = bcf.encode_header(hdr)
        h2, consumed = bcf.read_bcf_header(io.BytesIO(blob))
        assert consumed == len(blob)
        assert h2.strings == hdr.strings
        assert h2.contigs == hdr.contigs
        assert h2.vcf.samples == hdr.vcf.samples

    def test_guesser_every_offset(self):
        """From every byte offset in the record region, the guesser must
        land on a true record boundary (reference TestBCFSplitGuesser
        strategy)."""
        raw = open(PLAIN, "rb").read()
        hdr, hend = bcf.read_bcf_header(io.BytesIO(raw))
        bounds = []
        off = hend
        while off < len(raw):
            bounds.append(off)
            _, off = bcf.decode_record(raw, off, hdr)
        for probe in range(hend, len(raw)):
            got = bcf.guess_next_record_offset(raw[probe:], hdr)
            expect = next((b - probe for b in bounds if b >= probe), None)
            if got is not None:
                assert probe + got in bounds


class TestBCFSource:
    @pytest.mark.parametrize("path,kind", [(PLAIN, "plain"), (BGZF, "bgzf")])
    def test_sniff(self, path, kind):
        assert bcf_source.sniff_bcf(path) == kind
        assert bcf_source.sniff_bcf(TEXT) is None

    @pytest.mark.parametrize("path", [PLAIN, BGZF])
    @pytest.mark.parametrize("split", [64, 300, 1 << 20])
    def test_split_invariance(self, path, split):
        kind = bcf_source.sniff_bcf(path)
        hdr, hend = bcf_source.read_header(path, kind)
        size = os.path.getsize(path)
        if kind == "plain":
            bounds = list(range(0, size, split)) + [size]
            got = [
                r
                for i in range(len(bounds) - 1)
                for r in bcf_source._iter_plain(
                    bcf_source.BCFPlainPartition(path, bounds[i], bounds[i + 1]),
                    hdr,
                    hend,
                )
            ]
        else:
            def rr(p, s, n):
                with open(p, "rb") as fh:
                    fh.seek(s)
                    return fh.read(n)

            got = [
                r
                for s in bgzf.align_splits(path, size, split, rr)
                for r in bcf_source._iter_bgzf(
                    bcf_source.BCFBgzfPartition(path, s.start_coffset, s.end_coffset),
                    hdr,
                    hend,
                )
            ]
        assert [r[1] for r in got] == [14370, 17330, 1110696, 1230237, 1234567]

    @pytest.mark.parametrize("split", [4096, 16384, 70000])
    def test_multiblock_bgzf_no_record_loss(self, tmp_path, split):
        """Regression: _BgzfByteFeed.drop used to discard the floor
        block-start entry once later blocks were buffered, so block_of(base)
        returned the NEXT block's coffset and the end-of-split ownership
        check dropped records silently (e.g. 4,990/10,000 at split=4096).
        A multi-block file with small splits must return every record."""
        hdr, rows = _decode_all()
        blob = b"".join(bcf.encode_record(r, hdr) for r in rows) * 2000
        path = str(tmp_path / "big.bcf")
        with open(path, "wb") as fh:
            w = bgzf.BGZFWriter(fh)
            w.write(bcf.encode_header(hdr))
            w.write(blob)
            w.close()
        hdr2, hend = bcf_source.read_header(path, "bgzf")
        size = os.path.getsize(path)

        def rr(p, s, n):
            with open(p, "rb") as fh:
                fh.seek(s)
                return fh.read(n)

        got = [
            r
            for s in bgzf.align_splits(path, size, split, rr)
            for r in bcf_source._iter_bgzf(
                bcf_source.BCFBgzfPartition(path, s.start_coffset, s.end_coffset),
                hdr2,
                hend,
            )
        ]
        assert len(got) == 10000


class TestFastDecodeParity:
    """The inlined/bulk-unpack decode_record must match decode_record_ref
    (the spec-structured implementation) byte-for-byte on every fixture and
    on adversarial synthetic records."""

    def test_fixture_parity(self):
        hdr, rows = _decode_all()
        blob = b"".join(bcf.encode_record(r, hdr) for r in rows)
        off = off2 = 0
        while off < len(blob):
            r1, off = bcf.decode_record(blob, off, hdr)
            r2, off2 = bcf.decode_record_ref(blob, off2, hdr)
            assert off == off2 and r1 == r2

    def test_synthetic_parity(self):
        import random

        hdr_text = "\n".join([
            "##fileformat=VCFv4.2",
            '##contig=<ID=c1,length=1000>',
            '##FILTER=<ID=PASS,Description="d">',
            '##FILTER=<ID=q10,Description="d">',
            '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">',
            '##INFO=<ID=AF,Number=A,Type=Float,Description="d">',
            '##INFO=<ID=DB,Number=0,Type=Flag,Description="d">',
            '##INFO=<ID=XS,Number=1,Type=String,Description="d">',
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="d">',
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
            '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="d">',
            '##FORMAT=<ID=AF,Number=2,Type=Float,Description="d">',
            '##FORMAT=<ID=FC,Number=1,Type=String,Description="d">',
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA\tB",
        ]) + "\n"
        hdr = bcf.parse_bcf_header_text(hdr_text)
        rng = random.Random(42)
        rows = []
        for i in range(500):
            fm = {}
            if rng.random() < 0.7:
                fm["GT"] = rng.choice(["0/0", "0|1", "1/.", "./.", "1", "."])
                if fm["GT"] == ".":
                    del fm["GT"]
            if rng.random() < 0.5:
                fm["DP"] = str(rng.randrange(300))
            if rng.random() < 0.3:
                fm["PL"] = ",".join(str(rng.randrange(99)) for _ in range(3))
            if rng.random() < 0.3:
                fm["AF"] = "0.5,0.25"
            if rng.random() < 0.2:
                fm["FC"] = "xy"
            gts = [("A", fm.get("GT"), dict(fm)), ("B", fm.get("GT"), dict(fm))]
            info = {}
            if rng.random() < 0.5:
                info["DP"] = str(rng.randrange(100000))
            if rng.random() < 0.3:
                info["AF"] = "0.125"
            if rng.random() < 0.2:
                info["DB"] = "true"
            if rng.random() < 0.2:
                info["XS"] = "s" * rng.randrange(1, 30)
            rows.append((
                "c1", 1 + i, 1 + i,
                None if rng.random() < 0.5 else f"id{i}",
                "ACGT"[: 1 + rng.randrange(3)],
                None if rng.random() < 0.1 else ["T", "G"][: 1 + rng.randrange(2)],
                None if rng.random() < 0.3 else float(rng.randrange(999)) / 4,
                None if rng.random() < 0.2 else ["PASS"],
                info, gts,
            ))
        blob = b"".join(bcf.encode_record(r, hdr) for r in rows)
        off = off2 = 0
        n = 0
        while off < len(blob):
            r1, off = bcf.decode_record(blob, off, hdr)
            r2, off2 = bcf.decode_record_ref(blob, off2, hdr)
            assert off == off2 and r1 == r2, n
            n += 1
        assert n == len(rows)
