"""CRAM 3.0 container-level golden fixture + structural validator tests.

The rANS *codec* layer is pinned by hand-assembled spec vectors
(tests/test_rans_interop.py). This module pins the layer above — the
CRAM 3.0 **container/slice/compression-header byte layout** — the same
way: a complete minimal CRAM 3.0 file is assembled here byte-by-byte
from the published spec (file definition §6, container header §7, block
frame §8, compression header §10.3-10.6, slice header §8.5, EOF §9)
using only local helpers, with the derivation in comments. The engine's
reader (``formats/cram.py``), written months apart from this fixture,
must decode it to the expected SAM tuples; the engine-independent
validator (``tools/cram3_validator.py``) must accept it, accept
engine-WRITTEN files, and reject corrupted ones.

Interop target this guards: the reference's write path
(CRAMRecordWriter.java:74-121 -> htsjdk's 3.0 container writer) — a
same-author misreading of the container layout in both the engine's
reader and writer would survive engine-only roundtrips but not this
fixture or the validator's field-by-field spec walk.

Deliberate differences from the engine writer's own choices, so the
fixture exercises the SPEC, not the engine's habits: raw (method 0)
blocks instead of gzip, tab (0x09) as the read-name stop byte instead
of NUL, external content ids in the 40..90 range instead of 1..27, and
a mapped record whose sequence comes from an EMBEDDED reference block
with a substitution feature resolved through the SM matrix.
"""

import struct
import zlib

import pytest

from hadoop_bam_spark.formats import cram
from hadoop_bam_spark.tools import cram3_validator as V

# ---------------------------------------------------------------------------
# spec varint writers (local; re-derived from CRAM 3.0 §2.3)
# ---------------------------------------------------------------------------


def itf8(v: int) -> bytes:
    """Unsigned ITF8; negatives encode as 32-bit two's complement (the
    spec's ref-id=-1/-2 sentinels), always landing in the 5-byte form."""
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF,
                      (v >> 8) & 0xFF, v & 0xFF])
    # 5 bytes: high nibble of b0 is 0b1111; the FINAL byte carries only
    # the low 4 bits of the value (spec §2.3)
    return bytes([0xF0 | (v >> 28), (v >> 20) & 0xFF, (v >> 12) & 0xFF,
                  (v >> 4) & 0xFF, v & 0x0F])


def ltf8(v: int) -> bytes:
    """LTF8; this fixture only needs the small non-negative domain."""
    assert 0 <= v < 0x80
    return bytes([v])


def block(method: int, ctype: int, cid: int, data: bytes) -> bytes:
    """Block frame (spec §8): method, type, id, comp size, raw size,
    payload, CRC32 of everything before the CRC (v3)."""
    assert method == 0, "golden fixture uses raw blocks only"
    out = bytes([method, ctype]) + itf8(cid) + itf8(len(data)) \
        + itf8(len(data)) + data
    return out + struct.pack("<I", zlib.crc32(out))


def container_header(length, ref, start, span, nrec, counter, bases,
                     nblocks, landmarks) -> bytes:
    """Container header (spec §7) + its CRC32 (v3)."""
    out = struct.pack("<i", length) + itf8(ref) + itf8(start) \
        + itf8(span) + itf8(nrec) + ltf8(counter) + ltf8(bases) \
        + itf8(nblocks) + itf8(len(landmarks)) \
        + b"".join(itf8(lm) for lm in landmarks)
    return out + struct.pack("<I", zlib.crc32(out))


def ext_enc(cid: int) -> bytes:
    """EXTERNAL encoding (codec 1): params = the content id."""
    params = itf8(cid)
    return itf8(1) + itf8(len(params)) + params


def stop_enc(stop: int, cid: int) -> bytes:
    """BYTE_ARRAY_STOP encoding (codec 5): stop byte + content id."""
    params = bytes([stop]) + itf8(cid)
    return itf8(5) + itf8(len(params)) + params


def comp_header_block(pres_entries: list, ds_entries: list) -> bytes:
    """Compression-header block: three maps, each <size, count,
    entries...> where size covers count+entries (spec §10)."""
    pres = itf8(len(pres_entries)) + b"".join(pres_entries)
    ds = itf8(len(ds_entries)) + b"".join(ds_entries)
    tags = itf8(0)  # empty tag-encoding map
    data = itf8(len(pres)) + pres + itf8(len(ds)) + ds \
        + itf8(len(tags)) + tags
    return block(0, 1, 0, data)


#: preservation map shared by both data containers, except RR:
#: RN=1 (read names stored), AP=0 (absolute AP, not delta),
#: SM = five 0x1b bytes — for every reference base, substitution codes
#: 00,01,10,11 assigned to the alternative bases in ACGTN-minus-ref
#: order (so BS code 0 on ref G selects 'A'), TD = one empty tag line
#: ("" + NUL) so TL=0 means "no tags".
def pres_entries(rr: int) -> list:
    td = b"\x00"
    return [
        b"RN" + b"\x01",
        b"AP" + b"\x00",
        b"RR" + bytes([rr]),
        b"SM" + b"\x1b" * 5,
        b"TD" + itf8(len(td)) + td,
    ]


# ---------------------------------------------------------------------------
# the golden file
# ---------------------------------------------------------------------------

HEADER_TEXT = "@HD\tVN:1.6\tSO:unsorted\n@SQ\tSN:chr1\tLN:20\n"

#: chr1: 20 bases; the mapped slice below covers positions 5..8
#: (1-based) = "GGTT"
CHR1 = "AACCGGTTAACCGGTTAACC"


def build_golden() -> bytes:
    out = bytearray()
    # --- file definition (spec §6): magic, major=3, minor=0, 20-byte id
    out += b"CRAM" + bytes([3, 0]) + b"golden-fixture".ljust(20, b"\x00")

    # --- SAM header container (spec §7): one file-header block whose
    # payload is <int32 text length><text>
    payload = struct.pack("<i", len(HEADER_TEXT)) + HEADER_TEXT.encode()
    hdr_block = block(0, 0, 0, payload)
    out += container_header(len(hdr_block), 0, 0, 0, 0, 0, 0, 1, [0])
    out += hdr_block

    # ======================================================================
    # data container A: 2 unmapped, detached records in a MULTI-REF slice
    # (slice ref_seq_id = -2, so RI is read per record).
    #
    # records (SAM view):
    #   q0001  flag 4  *  0  0  *  *  0  0  ACGT   ?@AB   (phred 30..33)
    #   q0002  flag 4  *  0  0  *  *  0  0  GATTA  IIIIJ  (phred 40*4,41)
    #
    # per-record series the spec's decode loop consumes, in order:
    #   BF CF RI RL AP RG RN(MF NS NP TS when detached) TL then BA[RL]
    #   and QS[RL]  (CF = 0x1 qual-stored | 0x2 detached = 3)
    # ======================================================================
    A = {  # content id -> raw external payload (ITF8 ints back-to-back)
        40: itf8(4) + itf8(4),                       # BF: both flag 4
        41: itf8(3) + itf8(3),                       # CF: stored|detached
        42: itf8(-1) + itf8(-1),                     # RI: unplaced
        43: itf8(4) + itf8(5),                       # RL: 4, 5
        44: itf8(0) + itf8(0),                       # AP: pos 0
        45: itf8(-1) + itf8(-1),                     # RG: none
        46: b"q0001\tq0002\t",                       # RN, tab-stopped
        47: itf8(0) + itf8(0),                       # MF
        48: itf8(-1) + itf8(-1),                     # NS: mate ref *
        49: itf8(0) + itf8(0),                       # NP
        50: itf8(0) + itf8(0),                       # TS
        51: itf8(0) + itf8(0),                       # TL: empty tag line
        52: b"ACGT" + b"GATTA",                      # BA: verbatim bases
        53: bytes([30, 31, 32, 33, 40, 40, 40, 40, 41]),  # QS raw phred
    }
    ds_a = [
        b"BF" + ext_enc(40), b"CF" + ext_enc(41), b"RI" + ext_enc(42),
        b"RL" + ext_enc(43), b"AP" + ext_enc(44), b"RG" + ext_enc(45),
        b"RN" + stop_enc(0x09, 46),                  # tab stop, like htsjdk
        b"MF" + ext_enc(47), b"NS" + ext_enc(48), b"NP" + ext_enc(49),
        b"TS" + ext_enc(50), b"TL" + ext_enc(51),
        b"BA" + ext_enc(52), b"QS" + ext_enc(53),
    ]
    comp_a = comp_header_block(pres_entries(rr=0), ds_a)

    ids_a = sorted(A)
    slice_hdr_a = (
        itf8(-2)            # ref_seq_id -2: multi-reference slice
        + itf8(0) + itf8(0)  # alignment start/span: 0 for multi-ref
        + itf8(2)            # 2 records
        + ltf8(0)            # global record counter starts at 0
        + itf8(1 + len(ids_a))  # blocks: core + externals
        + itf8(len(ids_a)) + b"".join(itf8(i) for i in ids_a)
        + itf8(-1)           # no embedded reference
        + bytes(16)          # reference MD5: all-zero = not computed
    )
    slice_a = block(0, 2, 0, slice_hdr_a)
    core = block(0, 5, 0, b"")  # empty core: every codec is external
    ext_a = b"".join(block(0, 4, cid, A[cid]) for cid in ids_a)
    body_a = comp_a + slice_a + core + ext_a
    out += container_header(
        len(body_a), -2, 0, 0, 2, 0, 9,              # 9 bases total
        1 + 1 + 1 + len(ids_a),                      # comp+slice+core+ext
        [len(comp_a)],                               # landmark: slice hdr
    )
    out += body_a

    # ======================================================================
    # data container B: 1 mapped record on chr1 in a SINGLE-REF slice
    # whose reference bases come from an EMBEDDED ref block (id 90,
    # bases for positions start..start+span-1 = 5..8 = "GGTT").
    #
    # record: q0003, flag 0, chr1:5, MAPQ 60, 4M with one substitution
    # feature at read position 2 (FP delta 2 from 0): ref base G with
    # BS code 0 -> 'A' via the SM matrix above. Decoded SAM view:
    #   q0003  0  chr1  5  60  4M  *  0  0  GATT  DEFG  (phred 35..38)
    # ======================================================================
    B = {
        60: itf8(0),          # BF: flag 0 (mapped)
        61: itf8(3),          # CF: qual stored | detached
        62: itf8(4),          # RL
        63: itf8(5),          # AP: alignment position 5
        64: itf8(-1),         # RG
        65: b"q0003\t",       # RN
        66: itf8(0),          # MF
        67: itf8(-1),         # NS
        68: itf8(0),          # NP
        69: itf8(0),          # TS
        70: itf8(0),          # TL
        71: itf8(1),          # FN: one feature
        72: b"X",             # FC: substitution
        73: itf8(2),          # FP: position delta -> read pos 2
        74: bytes([0]),       # BS: substitution code 0 (ref G -> A)
        75: itf8(60),         # MQ
        76: bytes([35, 36, 37, 38]),  # QS raw phred -> "DEFG"
        90: b"GGTT",          # embedded reference window, pos 5..8
    }
    ds_b = [
        b"BF" + ext_enc(60), b"CF" + ext_enc(61), b"RL" + ext_enc(62),
        b"AP" + ext_enc(63), b"RG" + ext_enc(64),
        b"RN" + stop_enc(0x09, 65),
        b"MF" + ext_enc(66), b"NS" + ext_enc(67), b"NP" + ext_enc(68),
        b"TS" + ext_enc(69), b"TL" + ext_enc(70),
        b"FN" + ext_enc(71), b"FC" + ext_enc(72), b"FP" + ext_enc(73),
        b"BS" + ext_enc(74), b"MQ" + ext_enc(75), b"QS" + ext_enc(76),
    ]
    comp_b = comp_header_block(pres_entries(rr=1), ds_b)
    ids_b = sorted(B)
    slice_hdr_b = (
        itf8(0)              # single-ref slice on ref 0 (chr1)
        + itf8(5) + itf8(4)  # alignment start 5, span 4
        + itf8(1)            # 1 record
        + ltf8(2)            # counter: 2 records came before (container A)
        + itf8(1 + len(ids_b))
        + itf8(len(ids_b)) + b"".join(itf8(i) for i in ids_b)
        + itf8(90)           # embedded reference block content id
        + bytes(16)
    )
    slice_b = block(0, 2, 0, slice_hdr_b)
    ext_b = b"".join(block(0, 4, cid, B[cid]) for cid in ids_b)
    body_b = comp_b + slice_b + core + ext_b
    out += container_header(
        len(body_b), 0, 5, 4, 1, 2, 4,
        1 + 1 + 1 + len(ids_b),
        [len(comp_b)],
    )
    out += body_b

    # --- EOF container (spec §9) assembled from ITS spec fields too:
    # an empty container (length 15, ref -1, start 4542278 = "EOF" as
    # ASCII, one raw compression-header block of three empty maps);
    # asserted byte-exact against the published constant below.
    eof_block = block(0, 1, 0, itf8(1) + itf8(0)  # pres map: size1,count0
                      + itf8(1) + itf8(0)         # data-series map
                      + itf8(1) + itf8(0))        # tag map
    eof = container_header(len(eof_block), -1, 4542278, 0, 0, 0, 0, 1, [])
    out += eof + eof_block
    return bytes(out)


EXPECTED = [
    ("q0001", 4, None, 0, 0, None, None, 0, 0, "ACGT", "?@AB", {}),
    ("q0002", 4, None, 0, 0, None, None, 0, 0, "GATTA", "IIIIJ", {}),
    ("q0003", 0, "chr1", 5, 60, "4M", None, 0, 0, "GATT", "DEFG", {}),
]


@pytest.fixture(scope="module")
def golden_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cram3") / "golden.cram"
    p.write_bytes(build_golden())
    return str(p)


class TestGoldenFixture:
    def test_eof_assembly_matches_published_constant(self):
        """The same field-by-field helpers reproduce the spec's fixed
        38-byte EOF container exactly — pinning the container-header
        field order, ITF8/LTF8 forms, and both CRC32 placements against
        a published byte string nobody in this repo authored."""
        eof_block = block(0, 1, 0, itf8(1) + itf8(0) + itf8(1) + itf8(0)
                          + itf8(1) + itf8(0))
        eof = container_header(len(eof_block), -1, 4542278, 0, 0, 0, 0,
                               1, []) + eof_block
        assert eof == V.EOF_V3
        assert eof == cram.EOF_CONTAINER_V3

    def test_eof_v2_assembly_matches_published_constant(self):
        """The v2.1 EOF container is the same assembly minus BOTH
        CRC32 fields (CRCs arrived in 3.0): an 11-byte raw block of
        three empty maps behind a CRC-less container header."""
        blk = bytes([0, 1]) + itf8(0) + itf8(6) + itf8(6) \
            + itf8(1) + itf8(0) + itf8(1) + itf8(0) + itf8(1) + itf8(0)
        hdr = struct.pack("<i", len(blk)) + itf8(-1) + itf8(4542278) \
            + itf8(0) + itf8(0) + ltf8(0) + ltf8(0) + itf8(1) + itf8(0)
        assert hdr + blk == cram.EOF_CONTAINER_V2

    def test_engine_decodes_hand_assembled_container(self, golden_path):
        """The engine's reader, given bytes it never wrote, produces
        exactly the spec-derived records — unmapped verbatim-base
        records from a multi-ref slice AND a mapped record rebuilt from
        an embedded reference block + substitution feature."""
        assert list(cram.decode_file(golden_path)) == EXPECTED

    def test_engine_header_parse(self, golden_path):
        major, text, refs, rgs, _pos = cram.read_cram_file_header(
            golden_path)
        assert major == 3
        assert refs == [("chr1", 20)]
        assert rgs == []

    def test_validator_accepts_golden(self, golden_path):
        assert V.validate_file(golden_path) == []

    def test_spark_source_reads_golden(self, spark, golden_path):
        from hadoop_bam_spark.sources import register_all

        register_all(spark)
        df = (spark.read.format("cram")
              .load(golden_path)
              .orderBy("qname"))
        rows = df.select("qname", "flag", "rname", "pos", "mapq",
                         "cigar", "seq", "qual").collect()
        got = [tuple(r) for r in rows]
        assert got == [
            ("q0001", 4, None, 0, 0, None, "ACGT", "?@AB"),
            ("q0002", 4, None, 0, 0, None, "GATTA", "IIIIJ"),
            ("q0003", 0, "chr1", 5, 60, "4M", "GATT", "DEFG"),
        ]
