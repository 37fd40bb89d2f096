"""Property-based codec tests (hypothesis): the pure-Python format layer
must round-trip arbitrary inputs, not just the fixtures.

Targets mirror the reference's most failure-prone byte-level contracts:
BGZF block framing (util/BGZFCodec.java), virtual-offset arithmetic
(FileVirtualSplit.java:73-78), CRAM ITF8/LTF8 varints (CRAM spec §2.3),
the splitting-index layouts (SplittingBAMIndex.java:41-90), and UCSC
binning (SAM spec §5.3).
"""

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_bam_spark.formats import bgzf
from hadoop_bam_spark.formats.cram import (
    read_itf8,
    read_ltf8,
    write_itf8,
    write_ltf8,
)
from hadoop_bam_spark.formats.bam import reg2bin
from hadoop_bam_spark.formats.bai import reg2bins
from hadoop_bam_spark.formats.splitting_index import SplittingIndex


class TestBGZFProperties:
    @given(st.binary(min_size=0, max_size=300_000))
    @settings(max_examples=25, deadline=None)
    def test_write_read_roundtrip(self, payload):
        buf = io.BytesIO()
        w = bgzf.BGZFWriter(buf)
        w.write(payload)
        w.close()
        data = buf.getvalue()
        assert bgzf.is_bgzf(data[:18]) or payload == b""
        r = bgzf.BGZFReader(io.BytesIO(data))
        assert r.read(len(payload) + 1) == payload

    @given(st.binary(min_size=1, max_size=100_000), st.integers(1, 99_999))
    @settings(max_examples=15, deadline=None)
    def test_voffset_seek_matches_slice(self, payload, cut):
        cut = min(cut, len(payload))
        buf = io.BytesIO()
        w = bgzf.BGZFWriter(buf)
        w.write(payload[:cut])
        v = w.tell_voffset()
        w.write(payload[cut:])
        w.close()
        r = bgzf.BGZFReader(io.BytesIO(buf.getvalue()))
        r.seek_voffset(v)
        assert r.read(len(payload)) == payload[cut:]


class TestVoffsetArithmetic:
    @given(st.integers(0, 2**47 - 1), st.integers(0, 0xFFFF))
    @settings(max_examples=200, deadline=None)
    def test_make_split_roundtrip(self, coffset, uoffset):
        v = bgzf.make_voffset(coffset, uoffset)
        assert bgzf.split_voffset(v) == (coffset, uoffset)
        assert v >> 16 == coffset and v & 0xFFFF == uoffset


class TestCRAMVarints:
    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=200, deadline=None)
    def test_itf8_roundtrip(self, v):
        enc = write_itf8(v)
        got, p = read_itf8(enc, 0)
        assert got == v and p == len(enc)

    @given(st.integers(-(2**63), 2**63 - 1))
    @settings(max_examples=200, deadline=None)
    def test_ltf8_roundtrip(self, v):
        enc = write_ltf8(v)
        got, p = read_ltf8(enc, 0)
        assert got == v and p == len(enc)


class TestSplittingIndexProperties:
    @given(
        st.lists(st.integers(0, 2**62), min_size=1, max_size=50, unique=True),
        st.integers(0, 1 << 40),
    )
    @settings(max_examples=50, deadline=None)
    def test_both_layouts_roundtrip(self, voffsets, extra_length):
        voffsets = sorted(voffsets)
        # voffsets must lie inside the file (the reference layout's
        # terminating entry is file_length<<16 and must sort last)
        file_length = (voffsets[-1] >> 16) + 1 + extra_length
        idx = SplittingIndex(4096, voffsets, file_length)
        own = io.BytesIO()
        idx.write(own)
        own.seek(0)
        back = SplittingIndex.read(own)
        assert back.voffsets == voffsets
        assert back.file_length == file_length

        ref = io.BytesIO()
        idx.write_reference_layout(ref)
        ref.seek(0)
        back2 = SplittingIndex.read_reference_layout(ref)
        assert back2.voffsets == voffsets
        assert back2.file_length == file_length

    @given(
        st.lists(st.integers(0, 2**62), min_size=1, max_size=30, unique=True),
        st.integers(0, 2**47),
    )
    @settings(max_examples=50, deadline=None)
    def test_next_prev_bracket_every_offset(self, voffsets, probe):
        # Contract (reference SplittingBAMIndex.java:78-83): floor/ceiling
        # against the VIRTUAL offset probe<<16 — a record starting mid-block
        # at the probe's block is after the probe boundary, not before.
        voffsets = sorted(voffsets)
        idx = SplittingIndex(4096, voffsets, 1 << 48)
        nxt = idx.next_record(probe)
        prv = idx.prev_record(probe)
        boundary = probe << 16
        if nxt is not None:
            assert nxt >= boundary
            assert all(v >= nxt or v < boundary for v in voffsets)
        else:
            assert all(v < boundary for v in voffsets)
        if prv is not None:
            assert prv <= boundary
            assert all(v <= prv or v > boundary for v in voffsets)
        else:
            assert all(v > boundary for v in voffsets)


class TestBinning:
    @given(st.integers(0, 2**29 - 2), st.integers(1, 10_000))
    @settings(max_examples=200, deadline=None)
    def test_reg2bin_is_in_reg2bins(self, beg, span):
        end = min(beg + span, 2**29 - 1)
        # the bin assigned to [beg, end) must be among the bins that
        # overlap [beg, end) — otherwise index queries would miss records
        assert reg2bin(beg, end) in reg2bins(beg, end)
