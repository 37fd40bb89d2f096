"""Vectorized CRAM encode (formats/cram_venc.py): container-byte parity
with the scalar ``cram.encode_container`` (the oracle), fallback triggers,
and decode round-trips through the existing readers."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_bam_spark.formats import cram
from hadoop_bam_spark.formats.cram_venc import (
    CRAMColumnEncoder,
    VecUnsupported,
    itf8_stream,
)

REFS = [("chr1", 100000), ("chr2", 50000)]
REF_INDEX = {n: i for i, (n, _) in enumerate(REFS)}

EDGE_ROWS = [
    ("r1", 0, "chr1", 10, 30, "4M", None, 0, 0, "ACGT", "IIII", {"NM": "i:1"}),
    ("r2", 4, None, 0, 0, None, None, 0, 0, "ACG", None, {}),
    ("r3", 16, "chr2", 99, 60, "2M1I2D3M", "chr1", 5, -42, "ACGTAC",
     "!!!!~~", {"MD": "Z:abc", "AS": "i:-7", "XX": "f:1.5"}),
    ("r4", 0, "chr1", 1, 255, "1S2M", "chr2", 1, 0, "NNT", "III",
     {"BB": "B:c,1,-2,3"}),
    ("r5", 0, "chr1", 20000, 30, "100M", None, 0, 0, None, None,
     {"ZZ": "Z:hello world"}),
    ("r6", 0, "chr2", 49999, 30, "2H3M2S", None, 0, 0, "ACGTN", "IIIII", {}),
    ("r7", 4, None, 0, 0, None, None, 0, 0, None, None, {}),
    ("r8", 0, "chr1", 500, 0, "2M1N2M2P1M1D1M", None, 0, 0, "ACGTAC",
     "ABCDEF", {"NM": "i:1", "ZZ": "Z:x"}),
    ("r9", 16, "chr1", 700, 9, None, None, 0, 0, "ACGT", "IIII", {}),
]


def rows_to_batch(rows):
    cols = list(zip(*rows))
    return pa.RecordBatch.from_arrays(
        [
            pa.array(cols[0], pa.string()), pa.array(cols[1], pa.int32()),
            pa.array(cols[2], pa.string()), pa.array(cols[3], pa.int32()),
            pa.array(cols[4], pa.int32()), pa.array(cols[5], pa.string()),
            pa.array(cols[6], pa.string()), pa.array(cols[7], pa.int32()),
            pa.array(cols[8], pa.int32()), pa.array(cols[9], pa.string()),
            pa.array(cols[10], pa.string()),
            pa.array([list(t.keys()) for t in cols[11]],
                     pa.list_(pa.string())),
            pa.array([list(t.values()) for t in cols[11]],
                     pa.list_(pa.string())),
        ],
        names=["qname", "flag", "rname", "pos", "mapq", "cigar", "rnext",
               "pnext", "tlen", "seq", "qual", "tag_keys", "tag_vals"],
    )


def scalar_container(rows, counter=0, rps=10000):
    return cram.encode_container(
        [tuple(r) for r in rows], REF_INDEX, counter,
        records_per_slice=rps,
    )


def vec_container(rows, counter=0, rps=10000):
    return CRAMColumnEncoder(REF_INDEX).encode_container(
        rows_to_batch(rows), counter, records_per_slice=rps
    )


def test_itf8_stream_matches_scalar():
    vals = [0, 1, 127, 128, 0x3FFF, 0x4000, 0x1FFFFF, 0x200000,
            0xFFFFFFF, 0x10000000, 0x7FFFFFFF, -1, -2, -42]
    exp = b"".join(cram.write_itf8(v) for v in vals)
    got = itf8_stream(np.array(vals, np.int64)).tobytes()
    assert got == exp


def test_edge_rows_byte_parity():
    assert vec_container(EDGE_ROWS) == scalar_container(EDGE_ROWS)


def test_multi_slice_parity():
    rows = EDGE_ROWS * 7  # 63 records, slice boundary mid-stream
    assert vec_container(rows, counter=11, rps=10) == \
        scalar_container(rows, counter=11, rps=10)


def test_sliced_batch_parity():
    """Arrow slices carry a nonzero offset — buffer math must respect it."""
    batch = rows_to_batch(EDGE_ROWS)
    enc = CRAMColumnEncoder(REF_INDEX)
    for lo in (0, 3):
        part = batch.slice(lo, 4)
        rows = EDGE_ROWS[lo:lo + 4]
        assert enc.encode_container(part, 0) == scalar_container(rows)


def test_decode_roundtrip(tmp_path):
    """Venc container bytes must read back through the existing CRAM
    reader identically to a scalar-encoded container."""
    path = str(tmp_path / "v.cram")
    with open(path, "wb") as f:
        cram.write_file_definition(f)
        f.write(cram.encode_header_container(
            "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n@SQ\tSN:chr2\tLN:50000\n"
        ))
        f.write(vec_container(EDGE_ROWS))
        f.write(cram.EOF_CONTAINER_V3)
    out = list(cram.decode_file(path))
    assert len(out) == len(EDGE_ROWS)
    for got, row in zip(out, EDGE_ROWS):
        assert got[0] == row[0]          # qname
        assert got[1] == row[1]          # flag
        assert (got[9] or None) == row[9]  # seq


def test_fallback_non_ascii_and_empty_seq():
    rows = [("ré", 0, "chr1", 1, 30, "1M", None, 0, 0, "A", "I", {})]
    with pytest.raises(VecUnsupported):
        vec_container(rows)
    rows = [("r", 4, None, 0, 0, None, None, 0, 0, "", None, {})]
    with pytest.raises(VecUnsupported):
        vec_container(rows)


def test_cigar_qlen_mismatch_raises_valueerror():
    rows = [("r", 0, "chr1", 1, 30, "3M", None, 0, 0, "ACGT", "IIII", {})]
    with pytest.raises(ValueError, match="length"):
        vec_container(rows)
    with pytest.raises(ValueError, match="length"):
        scalar_container(rows)


_QNAME = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1,
    max_size=8)
_SEQ = st.text(alphabet="ACGTN", min_size=1, max_size=30)
_TAGS = st.dictionaries(
    st.sampled_from(["NM", "AS", "XS", "ZZ", "MD"]),
    st.sampled_from(["i:1", "i:-7", "Z:ab", "f:1.5", "A:x", "B:C,1,2",
                     "Z:", "i:300000"]),
    max_size=3,
)


@st.composite
def _records(draw):
    mapped = draw(st.booleans())
    seq = draw(st.one_of(st.none(), _SEQ))
    if mapped:
        rname = draw(st.sampled_from(["chr1", "chr2"]))
        pos = draw(st.integers(1, 99000))
        if seq is not None:
            # build a cigar consuming exactly len(seq) read bases
            n = len(seq)
            ops = []
            left = n
            while left > 0:
                take = draw(st.integers(1, left))
                op = draw(st.sampled_from("MIS"))
                ops.append(f"{take}{op}")
                left -= take
                if draw(st.booleans()):
                    ops.append(f"{draw(st.integers(1, 5))}"
                               f"{draw(st.sampled_from('DNHP'))}")
            cigar = "".join(ops) or None
        else:
            cigar = draw(st.one_of(st.none(), st.just("10M"), st.just("3M2I1D")))
        flag = draw(st.sampled_from([0, 16, 83, 99]))
    else:
        rname, pos, cigar = None, 0, None
        flag = 4
    qual = (None if seq is None
            else draw(st.one_of(st.none(), st.just("I" * len(seq)))))
    rnext = draw(st.sampled_from([None, "chr1", "chr2"]))
    return (
        draw(_QNAME), flag, rname, pos,
        draw(st.integers(0, 254)) if mapped else 0, cigar, rnext,
        draw(st.integers(0, 1000)), draw(st.integers(-500, 500)), seq, qual,
        draw(_TAGS),
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(_records(), min_size=1, max_size=40),
       st.integers(1, 17))
def test_property_parity(rows, rps):
    assert vec_container(rows, counter=3, rps=rps) == \
        scalar_container(rows, counter=3, rps=rps)
