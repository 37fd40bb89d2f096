"""Columnar BAM decode (formats/bam_vec.py) vs the per-record row codec.

The row codec (bam.decode_record) is the behavioral spec; every column the
vectorized decoder emits must match it value-for-value, including the edge
cases: no cigar, empty seq, odd-length seq, missing (0xFF) qual, unmapped
refID=-1, every tag wire type, records spanning BGZF block boundaries.
"""

from __future__ import annotations

import io
import struct

import pytest

from hadoop_bam_spark.formats import bam, bam_vec, bgzf
from hadoop_bam_spark.formats.sam import SAMHeader, parse_header

REFS = [("chr1", 1_000_000), ("chr2", 2_000_000)]


def _header() -> SAMHeader:
    return parse_header(
        ["@HD\tVN:1.6", "@SQ\tSN:chr1\tLN:1000000", "@SQ\tSN:chr2\tLN:2000000"]
    )


def _edge_rows() -> list[tuple]:
    # (qname, flag, rname, pos, mapq, cigar, rnext, pnext, tlen, seq, qual, tags)
    return [
        ("r_plain", 0, "chr1", 100, 60, "5M", "chr1", 150, 50, "ACGTA", "IIIII",
         {"NM": "1"}),
        ("r_nocigar", 4, None, 0, 0, None, None, 0, 0, "ACG", "III", {}),
        ("r_noseq", 4, None, 0, 0, None, None, 0, 0, None, None, {}),
        ("r_oddseq", 0, "chr2", 555, 30, "3M1I3M", "chr1", 1, -20, "ACGTACG",
         "IIIIIII", {}),
        ("r_noqual", 0, "chr1", 7, 20, "4M", None, 0, 0, "ACGT", None, {}),
        ("r_tags", 0, "chr1", 42, 11, "2M2S", "chr2", 999, 0, "ACGT", "FFFF",
         {"XA": "A:Q", "Xi": "-5", "Xf": "1.5", "XZ": "hello world",
          "XB": "i,1,2,3", "XH": "H:DEADBEEF"}),
        ("r_longcigar", 0, "chr1", 9000, 60, "10M2D30M5S", "chr1", 9000, 0,
         "A" * 45, "#" * 45, {}),
        ("r_star_ops", 16, "chr2", 123456, 1, "7=1X2N5M", None, 0, 0,
         "ACGTACGTACGTACG", None, {"NM": "0"}),
    ]


def _write_bam_bytes(rows, granularity=0) -> bytes:
    fh = io.BytesIO()
    bam.write_bam(fh, _header(), rows, refs=REFS, index_granularity=granularity)
    return fh.getvalue()


def _scan_columnar(data: bytes, fields=None, **flt):
    fh = io.BytesIO(data)
    reader = bgzf.BGZFReader(fh)
    _, refs, first_voffset = bam.read_header(reader)
    end = bgzf.make_voffset(len(data), 0)
    bodies = list(bam_vec.iter_bodies_span(fh, first_voffset, end))
    dec = bam_vec.BAMBatchDecoder(refs, fields=fields)
    cols = dec.decode(bodies, **flt)
    return cols, bodies, refs


def _scan_rows(data: bytes) -> list[tuple]:
    fh = io.BytesIO(data)
    reader = bgzf.BGZFReader(fh)
    _, refs, first_voffset = bam.read_header(reader)
    reader.seek_voffset(first_voffset)
    return list(bam.iter_records(reader, refs, first_voffset))


SAM_COLS = ["qname", "flag", "rname", "pos", "mapq", "cigar", "rnext",
            "pnext", "tlen", "seq", "qual", "tags"]


def _cols_to_rows(cols) -> list[tuple]:
    pylists = {k: cols[k].to_pylist() for k in cols}
    n = len(next(iter(pylists.values())))
    out = []
    for i in range(n):
        row = []
        for k in SAM_COLS:
            v = pylists[k][i]
            if k == "tags":
                v = dict(v) if v is not None else None
            row.append(v)
        out.append(tuple(row))
    return out


def test_columnar_matches_row_codec_edge_cases():
    data = _write_bam_bytes(_edge_rows())
    expected = _scan_rows(data)
    cols, bodies, _ = _scan_columnar(data)
    assert len(bodies) == len(_edge_rows())
    got = _cols_to_rows(cols)
    assert got == expected


def test_columnar_matches_row_codec_bulk_multi_block():
    # Enough records to span multiple BGZF blocks (> 64 KiB payload).
    rows = []
    for i in range(3000):
        seq = "ACGT"[(i % 4)] * (20 + i % 37)  # varying odd/even lengths
        rows.append(
            (f"read{i}", (i % 2) * 16, "chr1" if i % 3 else "chr2",
             i * 13 + 1, i % 60, f"{len(seq)}M", None, 0, 0, seq,
             chr(33 + i % 60) * len(seq), {"NM": str(i % 7)})
        )
    data = _write_bam_bytes(rows)
    expected = _scan_rows(data)
    cols, bodies, _ = _scan_columnar(data)
    assert len(bodies) == 3000
    assert _cols_to_rows(cols) == expected


def test_iter_bodies_span_ownership_midfile():
    """Splitting the scan at an arbitrary record boundary yields each record
    exactly once across the two spans (the voffset ownership rule)."""
    rows = [
        (f"r{i}", 0, "chr1", i + 1, 60, "4M", None, 0, 0, "ACGT", "IIII", {})
        for i in range(2000)
    ]
    data = _write_bam_bytes(rows, granularity=100)
    fh = io.BytesIO(data)
    reader = bgzf.BGZFReader(fh)
    _, refs, first_voffset = bam.read_header(reader)
    # recover record voffsets from the inline splitting offsets
    offs = bam.write_bam(io.BytesIO(), _header(), rows, refs=REFS,
                         index_granularity=100)
    # pick a mid-file record boundary; shift by the header the real file has
    fh2 = io.BytesIO(data)
    end = bgzf.make_voffset(len(data), 0)
    # find the voffset of record 700 by walking
    r = bgzf.BGZFReader(io.BytesIO(data))
    bam.read_header(r)
    for _ in range(700):
        head = r.read(4)
        (bs,) = struct.unpack("<i", head)
        r.read(bs)
    mid = r.tell_voffset()
    a = list(bam_vec.iter_bodies_span(io.BytesIO(data), first_voffset, mid))
    b = list(bam_vec.iter_bodies_span(io.BytesIO(data), mid, end))
    assert len(a) == 700 and len(b) == 1300
    dec = bam_vec.BAMBatchDecoder(refs)
    got = _cols_to_rows(dec.decode(a)) + _cols_to_rows(dec.decode(b))
    assert got == _scan_rows(data)


def test_columnar_filters():
    rows = [
        ("m1", 0, "chr1", 100, 60, "10M", None, 0, 0, "A" * 10, "I" * 10, {}),
        ("m2", 0, "chr2", 500, 60, "10M", None, 0, 0, "C" * 10, "I" * 10, {}),
        ("u1", 4, None, 0, 0, None, None, 0, 0, "G" * 4, None, {}),
        ("m3", 0, "chr1", 200, 60, "5M10D5M", None, 0, 0, "T" * 10, "I" * 10, {}),
    ]
    data = _write_bam_bytes(rows)
    cols, _, _ = _scan_columnar(data, unmapped_only=True)
    assert [r[0] for r in _cols_to_rows(cols)] == ["u1"]
    # interval chr1:105-110 overlaps m1 (100..109) but not m3 (200..219)
    cols, _, _ = _scan_columnar(data, intervals_by_rid=[(0, 105, 110)])
    assert [r[0] for r in _cols_to_rows(cols)] == ["m1"]
    # interval chr1:210-212 overlaps m3 via its deletion-extended span
    cols, _, _ = _scan_columnar(data, intervals_by_rid=[(0, 210, 212)])
    assert [r[0] for r in _cols_to_rows(cols)] == ["m3"]
    # nothing matches -> None
    cols, _, _ = _scan_columnar(data, intervals_by_rid=[(1, 1, 2)])
    assert cols is None


def test_columnar_projection_subset():
    data = _write_bam_bytes(_edge_rows())
    cols, _, _ = _scan_columnar(data, fields=["qname", "pos", "seq"])
    assert set(cols) == {"qname", "pos", "seq"}
    full = _scan_rows(data)
    assert cols["qname"].to_pylist() == [r[0] for r in full]
    assert cols["pos"].to_pylist() == [r[3] for r in full]
    assert cols["seq"].to_pylist() == [r[9] for r in full]


def test_iter_body_batches_matches_bodies_span():
    """The batched (buffer, starts, lens) walker must produce exactly the
    bodies the per-record walker yields, across batch cuts, span edges and
    records spanning BGZF blocks."""
    rows = []
    for i in range(5000):
        seq = "ACGT" * (5 + i % 50)
        rows.append(
            (f"q{i}", 0, "chr1", i + 1, 60, f"{len(seq)}M", None, 0, 0, seq,
             "I" * len(seq), {"NM": str(i % 3)})
        )
    data = _write_bam_bytes(rows)
    fh = io.BytesIO(data)
    reader = bgzf.BGZFReader(fh)
    _, refs, first_voffset = bam.read_header(reader)
    end = bgzf.make_voffset(len(data), 0)
    expected = [bytes(b) for b in
                bam_vec.iter_bodies_span(io.BytesIO(data), first_voffset, end)]
    got = []
    for buf, starts, lens in bam_vec.iter_body_batches(
        io.BytesIO(data), first_voffset, end, batch_records=700
    ):
        for s, ln in zip(starts.tolist(), lens.tolist()):
            got.append(buf[s : s + ln])
    assert got == expected
    # mid-file split: same ownership rule as the per-record walker
    r = bgzf.BGZFReader(io.BytesIO(data))
    bam.read_header(r)
    for _ in range(1234):
        (bs,) = struct.unpack("<i", r.read(4))
        r.read(bs)
    mid = r.tell_voffset()
    left = [
        buf[s : s + ln]
        for buf, starts, lens in bam_vec.iter_body_batches(
            io.BytesIO(data), first_voffset, mid, batch_records=128
        )
        for s, ln in zip(starts.tolist(), lens.tolist())
    ]
    right = [
        buf[s : s + ln]
        for buf, starts, lens in bam_vec.iter_body_batches(
            io.BytesIO(data), mid, end, batch_records=128
        )
        for s, ln in zip(starts.tolist(), lens.tolist())
    ]
    assert len(left) == 1234
    assert left + right == expected


def test_columnar_non_ascii_qname_fallback():
    # latin-1 high bytes in a name: the from_buffers fast path must detect
    # and fall back rather than emit invalid utf8.
    rows = [("n\xe9", 4, None, 0, 0, None, None, 0, 0, "AC", "II", {})]
    data = _write_bam_bytes(rows)
    cols, _, _ = _scan_columnar(data)
    assert cols["qname"].to_pylist() == ["n\xe9"]
