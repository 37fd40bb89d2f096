"""Interop fixtures for the rANS-4x8 codec: HAND-ASSEMBLED streams.

Provenance (r10 VERDICT task #1): every other rANS test in this suite
is parity among the three same-author decoder layers plus the
same-author encoder. The sandbox has no htslib/htsjdk binary, no pysam,
and no network, and the one foreign CRAM fixture in the reference tree
(`/root/reference/src/test/resources/test.cram`,
`TestCRAMInputFormat.java:30-45`) is CRAM v2.1 — pre-rANS. So these
fixtures follow the verdict's sanctioned fallback: each stream below is
assembled BY HAND, byte by byte, straight from the CRAM 3.0
specification §13 (rANS codec; htslib `rans_static` 4x8 layout), with
the complete derivation written next to the bytes. The expected decoded
output is established by working the spec's DECODE recurrence on paper
(the arithmetic is reproduced in the comments), never by running any
engine code. If an engine decoder disagrees with a fixture, the engine
is wrong.

Layout constants under test (spec §13 / htslib rans_static):
- outer header: order byte, compressed size u32 LE, raw size u32 LE
- order-0 frequency table: ascending symbols, symbol-RLE (a symbol
  equal to previous+1 is followed by a count of FURTHER consecutive
  symbols), frequency < 128 in one byte else two bytes
  (0x80|hi, lo), 0x00 terminator; frequencies sum to 4096
- order-1: outer context list with the same symbol-RLE scheme, one
  order-0 table per context; a symbol's context is the previous byte
  of its quarter (0 at each quarter start); state 3 carries the
  ragged tail with its running context
- 4 interleaved states, u32 LE, at the table's end; initial encoder
  state 1<<23 (RANS_BYTE_L); decode: f = x & 0xFFF, sym = lookup[f],
  x' = freq[sym]*(x>>12) + f - cum[sym], then while x' < 1<<23
  consume one stream byte: x' = x'<<8 | byte
"""

from __future__ import annotations

import struct

import pytest

LOW = 1 << 23  # RANS_BYTE_L


def _hdr(order: int, body: bytes, n_out: int) -> bytes:
    return bytes([order]) + struct.pack("<II", len(body), n_out) + body


# ---------------------------------------------------------------------------
# Fixture V1 — order-0, "abab": minimal two-symbol table, no renorm.
#
# counts: 'a'(97)=2, 'b'(98)=2 -> normalized freqs 2048/2048,
# cum[a]=0, cum[b]=2048.
# Table wire: sym 97; freq 2048 >= 128 -> (0x80|(2048>>8), 2048&0xFF)
#   = (136, 0); next sym 98 == 97+1 -> followed by RLE count 0;
#   freq (136, 0); terminator 0.
# Encode (reverse order, states start LOW=0x800000, state j owns
# symbols i with i&3==j; x_max = ((LOW>>12)<<8)*2048 = 2^30, never
# reached from LOW, so zero renorm bytes; each state encodes ONE
# symbol):
#   'a': x = (0x800000//2048)<<12 + 0x800000%2048 + cum  (cum=0)
#          = 4096<<12 = 0x1000000 = 16777216
#   'b': same with cum=2048 -> 16779264
# symbol i=0 'a' -> s0, i=1 'b' -> s1, i=2 'a' -> s2, i=3 'b' -> s3.
# Decode check (paper): f = 16777216 & 4095 = 0 -> lookup[0]='a';
# f = 16779264 & 4095 = 2048 -> lookup[2048]='b'. qed.
# ---------------------------------------------------------------------------
_T_AB = bytes([97, 136, 0, 98, 0, 136, 0, 0])
V1_RAW = b"abab"
V1 = _hdr(0, _T_AB + struct.pack("<4I", 16777216, 16779264,
                                 16777216, 16779264), 4)

# ---------------------------------------------------------------------------
# Fixture V2 — order-0, "aaaaaaa" (n=7): single-symbol table with the
# maximal frequency 4096 (two-byte form (0x80|16, 0) = (144, 0)) and a
# ragged length (7 % 4 != 0 exercises the i&3 state interleave tail).
# Encode: f=4096 makes the update the identity
# (x' = (x//4096)<<12 + x%4096 + 0 = x), so all four states stay at
# LOW = 0x00800000 and no renorm bytes are emitted.
# Decode check: f = LOW & 4095 = 0 -> 'a'; x' = 4096*(LOW>>12) = LOW.
# ---------------------------------------------------------------------------
_T_A4096 = bytes([97, 144, 0, 0])
V2_RAW = b"a" * 7
V2 = _hdr(0, _T_A4096 + struct.pack("<4I", LOW, LOW, LOW, LOW), 7)

# ---------------------------------------------------------------------------
# Fixture V3 — order-1, "abababab" (n=8, q=2): deterministic contexts.
# Quarter starts (positions 0,2,4,6) have context 0; transitions are
# 0->'a' (x4) and 'a'->'b' (x4), so two live contexts each with a
# single symbol at freq 4096:
#   ctx 0:  table [97, 144, 0, 0]
#   ctx 97: table [98, 144, 0, 0]
# Outer wire: ctx 0; inner table; ctx 97 (not 0+1, no RLE byte);
# inner table; terminator 0.
# All freqs 4096 -> states stay LOW, zero renorm bytes.
# Decode check: state j, wave 0: ctx 0 -> lookup[LOW&4095=0]='a',
# x unchanged, ctx='a'; wave 1: ctx 97 -> 'b'. out[j*q+i] interleave
# gives 'a','b' per quarter -> "abababab".
# ---------------------------------------------------------------------------
_T_O1_DET = bytes([0]) + bytes([97, 144, 0, 0]) + bytes([97]) + bytes(
    [98, 144, 0, 0]) + bytes([0])
V3_RAW = b"abababab"
V3 = _hdr(1, _T_O1_DET + struct.pack("<4I", LOW, LOW, LOW, LOW), 8)

# ---------------------------------------------------------------------------
# Fixture V4 — order-0 DECODE-side vector with renorm bytes, n=6.
# Same 2048/2048 table as V1. States and renorm bytes are chosen by
# hand so the decode walk (on paper) is:
#   i=0 state0 x=0x00800800: f=0x800=2048 -> 'b';
#       x' = 2048*(0x00800800>>12) + 2048 - 2048 = 2048*2048 = 2^22
#       < LOW -> consume byte 0x07 -> x = 2^30 + 7
#   i=1 state1 x=0x00800000: f=0 -> 'a'; x' = 2^22 -> consume 0xFF
#       -> 2^30 + 255
#   i=2 state2 x=0x00800000: 'a'; consume 0x00 -> 2^30
#   i=3 state3 x=0x00800800: 'b'; consume 0x01 -> 2^30 + 1
#   i=4 state0 x=2^30+7: f=7 -> 'a'; x' = 2048*2^18 + 7 >= LOW
#   i=5 state1 x=2^30+255: f=255 -> 'a'
# -> "baabaa", consuming exactly the 4 renorm bytes present.
# (A spec-valid decodable stream need not be one an encoder with
# initial states LOW would emit; the spec decode algorithm defines its
# output. This pins the single-byte renorm path deterministically.)
# ---------------------------------------------------------------------------
V4_RAW = b"baabaa"
V4 = _hdr(0, _T_AB + struct.pack(
    "<4I", 0x00800800, 0x00800000, 0x00800000, 0x00800800
) + bytes([0x07, 0xFF, 0x00, 0x01]), 6)

# ---------------------------------------------------------------------------
# Fixture V5 — order-1 DECODE-side vector with renorm + RLE'd context
# list, n=8 (and V5T: the SAME body re-headed with n=9 to drive the
# state-3 ragged tail).
# Three live contexts 0, 97, 98, each with the V1 two-symbol table
# (2048/2048). Outer wire: ctx 0; inner; ctx 97 (not consecutive);
# inner; ctx 98 == 97+1 -> RLE count byte 0; inner; terminator 0.
# States s0=s2=s3=LOW, s1=0x00800801; renorm bytes [0, 3, 0, 0].
# Decode walk (q=2; wave 0 consumes the renorm bytes in state order):
#   w0 j0 ctx0 x=LOW:      f=0 -> 'a'; x'=2^22, consume 0 -> 2^30
#   w0 j1 ctx0 x=0x800801: f=0x801=2049 -> 'b';
#        x' = 2048*0x800 + 2049 - 2048 = 2^22+1, consume 3
#          -> (2^22+1)*256 + 3 = 2^30 + 259
#   w0 j2, j3 like j0 (consume 0 each) -> 'a', x=2^30
#   w1 j0 ctx'a' x=2^30:  f=0 -> 'a'; x' = 2^29 (no renorm)
#   w1 j1 ctx'b' x=2^30+259: f=259 -> 'a'; x' = 2^29+259
#   w1 j2, j3 -> 'a'
# out[j*2+i] -> positions: s0:(0,1) s1:(2,3) s2:(4,5) s3:(6,7)
#   = a,a,b,a,a,a,a,a -> "aabaaaaa"
# V5T (n=9): q = 9>>2 = 2, main loop identical, then the tail position
# 8 decodes on state 3 (x=2^29, running ctx 'a'): f=0 -> 'a';
# x' = 2048*2^17 = 2^28 >= LOW, no renorm -> "aabaaaaa" + "a".
# ---------------------------------------------------------------------------
_T_O1_3CTX = (bytes([0]) + _T_AB + bytes([97]) + _T_AB
              + bytes([98, 0]) + _T_AB + bytes([0]))
_V5_BODY = _T_O1_3CTX + struct.pack(
    "<4I", LOW, 0x00800801, LOW, LOW
) + bytes([0, 3, 0, 0])
V5_RAW = b"aabaaaaa"
V5 = _hdr(1, _V5_BODY, 8)
V5T_RAW = b"aabaaaaaa"
V5T = _hdr(1, _V5_BODY, 9)

# ---------------------------------------------------------------------------
# Fixture V6 — order-0, "abcd": four consecutive symbols so the table's
# symbol-RLE carries a REAL run count (V1/V5 only exercise count 0).
# counts 1 each -> freqs 1024 (two-byte form (0x80|4, 0) = (132, 0));
# cum = 0/1024/2048/3072.
# Table wire per the spec reader: sym 97; freq; sym 98 == 97+1 -> RLE
# count 2 (two MORE consecutive symbols, 99 and 100, follow implied);
# freq(98); freq(99); freq(100); terminator 0.
# Encode from LOW, f=1024: x' = (2^23//1024)<<12 + 0 + cum
#   = 8192<<12 + cum = 2^25 + cum; x_max = 2^19*1024 = 2^29 > LOW, so
# no renorm. s_j = 2^25 + j*1024 for symbols a,b,c,d in state order.
# Decode check: f = (2^25 + c) & 4095 = c & 4095; c in {0,1024,2048,
# 3072} -> lookup picks a/b/c/d. qed.
# ---------------------------------------------------------------------------
_T_ABCD = bytes([97, 132, 0, 98, 2, 132, 0, 132, 0, 132, 0, 0])
V6_RAW = b"abcd"
V6 = _hdr(0, _T_ABCD + struct.pack(
    "<4I", 1 << 25, (1 << 25) + 1024, (1 << 25) + 2048, (1 << 25) + 3072
), 4)

# ---------------------------------------------------------------------------
# Fixture V7 — order-1, "abbccdab": OUTER context-RLE with a real run
# count, plus an inner table with a symbol-RLE run.
# Quarters (q=2): "ab" "bc" "cd" "ab". Transitions: ctx 0 -> {a:2, b:1,
# c:1} (quarter starts), ctx 'a' -> {b:4096}, ctx 'b' -> {c:4096},
# ctx 'c' -> {d:4096}. ctx-0 counts (2,1,1)/4 quantize EXACTLY to
# 2048/1024/1024, cum a=0, b=2048, c=3072.
# inner table of ctx 0: syms 97,98,99 consecutive -> sym 97; freq
# (136,0); sym 98 == 97+1 -> RLE 1; freq 98 (132,0); freq 99 implied
# (132,0); terminator — pinning an inner symbol-RLE count of 1.
# OUTER wire: live ctxs [0, 97, 98, 99]: ctx 0; inner0; ctx 97 (not
# consecutive); inner97; ctx 98 == 97+1 -> RLE count 1 (ctx 99
# implied); inner98; inner99; terminator 0.
# Encode from LOW (reverse, per state: second symbol has f=4096 -> x
# unchanged; first is a quarter start against ctx 0):
#   s0: 'a' f=2048 c=0    -> (LOW//2048)<<12       = 2^24 = 0x01000000
#   s1: 'b' f=1024 c=2048 -> 8192<<12 + 2048       = 0x02000800
#   s2: 'c' f=1024 c=3072 -> 8192<<12 + 3072       = 0x02000C00
#   s3: 'a' like s0                                 = 0x01000000
# (x_max >= 2^29 everywhere; zero renorm bytes.)
# Decode check: j0 w0: f=0 -> 'a' (cum 0..2048); x = 2048*4096 = LOW;
# w1 ctx'a' -> 'b'. j1 w0: f=0x800=2048 -> 'b'; x = 1024*8192 = LOW;
# w1 ctx'b' -> 'c'. j2 w0: f=0xC00 -> 'c'; w1 ctx'c' -> 'd'. j3 like
# j0. out[j*2+i] -> "abbccdab". qed.
# ---------------------------------------------------------------------------
_T_O1_CTXRUN = (
    bytes([0])
    + bytes([97, 136, 0, 98, 1, 132, 0, 132, 0, 0])   # ctx 0 inner
    + bytes([97]) + bytes([98, 144, 0, 0])             # ctx 'a'
    + bytes([98, 1])                                   # ctx 'b', run 1
    + bytes([99, 144, 0, 0])                           # ctx 'b' inner
    + bytes([100, 144, 0, 0])                          # ctx 'c' inner
    + bytes([0])
)
V7_RAW = b"abbccdab"
V7 = _hdr(1, _T_O1_CTXRUN + struct.pack(
    "<4I", 0x01000000, 0x02000800, 0x02000C00, 0x01000000
), 8)

VECTORS = [
    ("v1_o0_two_sym", V1, V1_RAW),
    ("v2_o0_single_sym_ragged", V2, V2_RAW),
    ("v3_o1_deterministic_ctx", V3, V3_RAW),
    ("v4_o0_renorm", V4, V4_RAW),
    ("v5_o1_renorm_rle_ctx", V5, V5_RAW),
    ("v5t_o1_ragged_tail", V5T, V5T_RAW),
    ("v6_o0_symbol_rle_run", V6, V6_RAW),
    ("v7_o1_outer_ctx_rle_run", V7, V7_RAW),
]


@pytest.fixture
def numpy_only(monkeypatch):
    from hadoop_bam_spark.formats import rans_native

    monkeypatch.setattr(rans_native, "_lib", None)
    monkeypatch.setattr(rans_native, "_failed", True)


class TestGoldenDecode:
    """All three decoder layers must reproduce the hand-derived output
    byte-for-byte on every fixture."""

    @pytest.mark.parametrize("name,stream,raw", VECTORS)
    def test_scalar(self, name, stream, raw, numpy_only):
        from hadoop_bam_spark.formats.cram import rans_decode

        assert rans_decode(stream, len(raw)) == raw

    @pytest.mark.parametrize("name,stream,raw", VECTORS)
    def test_batch_scalar_fallback(self, name, stream, raw, numpy_only):
        # a 1-item batch sits below _MIN_LANES -> per-blob scalar path
        from hadoop_bam_spark.formats.rans_vec import decode_batch

        assert decode_batch([(stream, len(raw))]) == [raw]

    @pytest.mark.parametrize("name,stream,raw", VECTORS)
    def test_numpy_lockstep(self, name, stream, raw, numpy_only):
        # 30 copies clear _MIN_LANES -> the numpy lockstep kernel runs
        from hadoop_bam_spark.formats.rans_vec import decode_batch

        got = decode_batch([(stream, len(raw))] * 30)
        assert got == [raw] * 30

    @pytest.mark.parametrize("name,stream,raw", VECTORS)
    def test_native(self, name, stream, raw):
        from hadoop_bam_spark.formats import rans_native

        if not rans_native.available():
            pytest.skip("no C compiler in this environment")
        assert rans_native.decode(stream[9:], stream[0], len(raw)) == raw

    def test_mixed_golden_batch_lockstep(self, numpy_only):
        """Both lockstep kernels at once, finishing at different wave
        counts (compaction + scalar handoff on golden data)."""
        from hadoop_bam_spark.formats.rans_vec import decode_batch

        blobs, want = [], []
        for _name, stream, raw in VECTORS:
            blobs.extend([(stream, len(raw))] * 12)
            want.extend([raw] * 12)
        assert decode_batch(blobs) == want


class TestEncoderLayoutConformance:
    """The engine encoder must emit EXACTLY the hand-assembled bytes on
    inputs whose normalization is forced (equal counts -> 2048/2048;
    single symbol -> 4096) — any drift in the table wire format, state
    placement, or endianness is a byte mismatch here, independent of
    whether the engine decoder would still round-trip it."""

    def test_order0_two_symbol(self):
        from hadoop_bam_spark.formats.rans import rans_encode_order0

        assert rans_encode_order0(V1_RAW) == V1

    def test_order0_single_symbol_ragged(self):
        from hadoop_bam_spark.formats.rans import rans_encode_order0

        assert rans_encode_order0(V2_RAW) == V2

    def test_order1_deterministic_ctx(self):
        from hadoop_bam_spark.formats.rans import rans_encode_order1

        assert rans_encode_order1(V3_RAW) == V3

    def test_order0_symbol_rle_run(self):
        from hadoop_bam_spark.formats.rans import rans_encode_order0

        assert rans_encode_order0(V6_RAW) == V6

    def test_order1_outer_ctx_rle_run(self):
        from hadoop_bam_spark.formats.rans import rans_encode_order1

        assert rans_encode_order1(V7_RAW) == V7

    def test_comp_size_field_is_body_length(self):
        # htslib layout: bytes 1-4 = size of table+states+renorm
        from hadoop_bam_spark.formats.rans import (
            rans_encode_order0,
            rans_encode_order1,
        )

        for enc in (rans_encode_order0, rans_encode_order1):
            blob = enc(b"the quick brown fox " * 40)
            (comp, rawsz) = struct.unpack_from("<II", blob, 1)
            assert comp == len(blob) - 9
            assert rawsz == 800


class TestEncodedStreamSpecInvariants:
    """Parse engine-encoded streams with a TEST-LOCAL transcription of
    the spec's table reader (independent of formats/cram.py) and check
    the spec invariants htslib relies on: per-table frequencies sum to
    exactly 4096, final states >= RANS_BYTE_L, and the stream ends
    exactly where the renorm bytes do."""

    @staticmethod
    def _read_table(data: bytes, p: int):
        # direct transcription of spec §13 ReadFrequencies0
        freqs = [0] * 256
        sym = data[p]; p += 1
        last, rle = sym, 0
        while True:
            f = data[p]; p += 1
            if f >= 128:
                f = ((f & 127) << 8) | data[p]; p += 1
            freqs[sym] = f
            if rle > 0:
                rle -= 1; sym += 1
            else:
                last = sym
                sym = data[p]; p += 1
                if sym == last + 1:
                    rle = data[p]; p += 1
            if sym == 0:
                break
        return freqs, p

    def test_order0_invariants(self):
        from hadoop_bam_spark.formats.rans import rans_encode_order0

        data = bytes(range(256)) * 5 + b"skewed" * 333
        blob = rans_encode_order0(data)
        assert blob[0] == 0
        freqs, p = self._read_table(blob, 9)
        assert sum(freqs) == 4096
        states = struct.unpack_from("<4I", blob, p)
        assert all(s >= LOW for s in states)

    def test_order1_invariants(self):
        from hadoop_bam_spark.formats.rans import rans_encode_order1

        data = (b"IIIIIHHHGGF" * 211)[:2000]
        blob = rans_encode_order1(data)
        assert blob[0] == 1
        p = 9
        ctx = blob[p]; p += 1
        last, rle, n_ctx = ctx, 0, 0
        while True:
            freqs, p = self._read_table(blob, p)
            assert sum(freqs) == 4096
            n_ctx += 1
            if rle > 0:
                rle -= 1; ctx += 1
            else:
                last = ctx
                ctx = blob[p]; p += 1
                if ctx == last + 1:
                    rle = blob[p]; p += 1
            if ctx == 0:
                break
        assert n_ctx >= 2  # ctx 0 plus at least one real context
        states = struct.unpack_from("<4I", blob, p)
        assert all(s >= LOW for s in states)


class TestGoldenInsideCram:
    """A golden-equivalent stream embedded in a real engine-written CRAM
    container (codecs='rans') must decode through the full container
    path — proving the BLOCK-level fixtures and the container plumbing
    agree on where a rANS stream begins and ends."""

    def test_rans_block_in_container_roundtrip(self, tmp_path, numpy_only):
        from hadoop_bam_spark.formats import cram as cram_mod
        from hadoop_bam_spark.formats.cram import (
            Block,
            CT_EXTERNAL,
            M_RANS,
            read_itf8,
        )
        from hadoop_bam_spark.formats.rans import (
            rans_encode_order0,
            rans_encode_order1,
        )

        payload = b"FFFFEEEDDC" * 120
        ser = Block(M_RANS, CT_EXTERNAL, 7, payload).serialize(3)
        # walk the block framing by hand: method, content type, itf8
        # content id / comp size / raw size, then the embedded stream
        assert ser[0] == M_RANS
        p = 2
        cid, p = read_itf8(ser, p)
        csize, p = read_itf8(ser, p)
        rsize, p = read_itf8(ser, p)
        assert (cid, rsize) == (7, len(payload))
        stream = ser[p : p + csize]
        # the embedded stream is exactly an engine-encoder stream for
        # whichever order the sampler picked — layout framing intact
        want = (rans_encode_order0(payload) if stream[0] == 0
                else rans_encode_order1(payload))
        assert stream == want
        # and the standalone decoder recovers the payload from it
        assert cram_mod.rans_decode(stream, len(payload)) == payload
        # the full container-path parse agrees
        blk, _ = Block.parse(ser, 0, 3)
        assert blk.method == M_RANS and blk.data == payload
