"""Columnar CRAM slice decode parity: cram_vec.decode_slice_columnar must
produce EXACTLY the scalar _decode_slice output on every covered shape —
verbatim (RR=false), reference-based (RR=true) with substitutions/indels/
clips, unmapped mixes, noseq, detached mates, tags, multi-slice — and must
actually FIRE on our writer's output (not silently fall back)."""

import os
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_bam_spark.formats import cram, cram_vec

REF_CRAM = "/root/reference/src/test/resources/test.cram"
REF_FASTA = "/root/reference/src/test/resources/auxf.fa"


def _decode_both(body_rows, refs, ref_fasta_path=None, records_per_slice=10000,
                 ref_index=None, counter=0, qual_mode="stored"):
    """Encode rows -> decode via fast path AND forced-scalar path."""
    ref_index = ref_index or {name: i for i, (name, _l) in enumerate(refs)}
    ref_fasta = (
        cram.FastaRef(ref_fasta_path) if ref_fasta_path else None
    )
    body = cram.encode_container(
        body_rows, ref_index, counter, ref_fasta=ref_fasta,
        ref_names=[n for n, _ in refs], records_per_slice=records_per_slice,
        qual_mode=qual_mode,
    )
    hdr = cram.ContainerHeader.parse(body, 0, 3)
    payload = body[hdr.header_size:]

    fired = {"n": 0}
    orig = cram_vec.decode_slice_columnar

    def spy(*a, **k):
        r = orig(*a, **k)
        if r is not None:
            fired["n"] += 1
        return r

    cram_vec.decode_slice_columnar = spy
    try:
        dec = cram.ContainerDecoder(
            3, refs,
            ref_fasta=cram.FastaRef(ref_fasta_path) if ref_fasta_path else None,
        )
        fast = dec.decode(payload, hdr)
    finally:
        cram_vec.decode_slice_columnar = orig
    cram_vec_orig = cram_vec.decode_slice_columnar
    cram_vec.decode_slice_columnar = lambda *a, **k: None
    try:
        dec2 = cram.ContainerDecoder(
            3, refs,
            ref_fasta=cram.FastaRef(ref_fasta_path) if ref_fasta_path else None,
        )
        scalar = dec2.decode(payload, hdr)
    finally:
        cram_vec.decode_slice_columnar = cram_vec_orig
    return fast, scalar, fired["n"]


def _mk_fasta(tmp_path, seed=5):
    rng = random.Random(seed)
    c1 = "".join(rng.choice("ACGT") for _ in range(1000))
    c2 = "".join(rng.choice("ACGT") for _ in range(2000))
    p = str(tmp_path / "ref.fa")
    with open(p, "w") as fh:
        fh.write(">chr1\n")
        for i in range(0, 1000, 60):
            fh.write(c1[i:i + 60] + "\n")
        fh.write(">chr2\n")
        for i in range(0, 2000, 60):
            fh.write(c2[i:i + 60] + "\n")
    from hadoop_bam_spark.sinks import build_fai

    build_fai(p, p + ".fai")
    return p, {"chr1": c1, "chr2": c2}


REFS = [("chr1", 1000), ("chr2", 2000)]


def test_verbatim_mixed_parity():
    rng = random.Random(1)
    rows = []
    pos = 1
    for i in range(800):
        pos += rng.randint(0, 5)
        if i % 7 == 3:  # unmapped with seq
            rows.append((f"u{i}", 4, None, 0, 0, None, None, 0, 0,
                         "ACGTAC", "IIIIII", None))
        elif i % 7 == 5:  # unmapped, no seq, no qual
            rows.append((f"n{i}", 4, None, 0, 0, None, None, 0, 0,
                         None, None, None))
        else:
            ln = rng.randint(1, 40)
            seq = "".join(rng.choice("ACGT") for _ in range(ln))
            qual = "".join(chr(33 + rng.randint(0, 60)) for _ in range(ln))
            tags = {"NM": f"i:{i % 5}", "XS": "Z:hello"} if i % 3 == 0 else None
            rows.append((f"r{i}", 16 if i % 2 else 0,
                         "chr2" if i % 5 else "chr1", pos, i % 60,
                         f"{ln}M", None, 0, 0, seq, qual, tags))
    fast, scalar, fired = _decode_both(rows, REFS)
    assert fired >= 1, "columnar path did not fire"
    assert fast == scalar


def test_reference_based_parity(tmp_path):
    """RR=true: substitutions (X), indels, clips against the reference."""
    fasta, contigs = _mk_fasta(tmp_path)
    rng = random.Random(2)
    rows = []
    for i in range(400):
        contig = "chr1" if i % 2 else "chr2"
        ref = contigs[contig]
        pos = rng.randint(1, len(ref) - 80)
        ln = rng.randint(20, 60)
        base = list(ref[pos - 1: pos - 1 + ln])
        # sprinkle mismatches
        for _ in range(rng.randint(0, 3)):
            j = rng.randrange(ln)
            base[j] = rng.choice("ACGT")
        seq = "".join(base)
        cigar = f"{ln}M"
        if i % 5 == 0:  # soft clip + insertion + deletion shapes
            sc = "ACG"
            ins = "TT"
            half = ln // 2
            seq = sc + seq[:half] + ins + seq[half:]
            cigar = f"{len(sc)}S{half}M{len(ins)}I2D{ln - half}M"
        qual = "".join(chr(33 + rng.randint(0, 40)) for _ in range(len(seq)))
        rows.append((f"r{i}", 0, contig, pos, 60, cigar, None, 0, 0,
                     seq, qual, None))
    fast, scalar, fired = _decode_both(rows, REFS, ref_fasta_path=fasta)
    assert fired >= 1
    assert fast == scalar
    # spot-check a reconstruction is actually reference-driven
    assert fast[0][9] is not None and len(fast[0][9]) > 0


def test_multi_slice_parity():
    rng = random.Random(3)
    rows = []
    pos = 1
    for i in range(900):
        pos += rng.randint(0, 4)
        ln = rng.randint(1, 30)
        seq = "".join(rng.choice("ACGTN") for _ in range(ln))
        rows.append((f"r{i}", 0, "chr1", pos, 60, f"{ln}M", None, 0, 0,
                     seq, None, None))
    fast, scalar, fired = _decode_both(rows, REFS, records_per_slice=250)
    assert fired == 4  # 900/250 -> 4 slices, all columnar
    assert fast == scalar


def test_hard_and_pad_and_skip_ops():
    rows = [
        ("r0", 0, "chr1", 10, 60, "5H8M2N4M3P6M5H", None, 0, 0,
         "ACGTACGTACGTACGTAC", "I" * 18, None),
        ("r1", 0, "chr1", 40, 60, "3S5M", None, 0, 0,
         "TTTACGTA", "JJJJJJJJ", None),
    ]
    fast, scalar, fired = _decode_both(rows, REFS)
    assert fired >= 1
    assert fast == scalar


@pytest.mark.skipif(not os.path.exists(REF_CRAM), reason="fixtures absent")
def test_golden_file_still_decodes():
    rows = list(cram.decode_file(REF_CRAM, reference=REF_FASTA))
    assert len(rows) > 0  # whichever path fires, results must hold
    # parity against forced-scalar
    orig = cram_vec.decode_slice_columnar
    cram_vec.decode_slice_columnar = lambda *a, **k: None
    try:
        scalar = list(cram.decode_file(REF_CRAM, reference=REF_FASTA))
    finally:
        cram_vec.decode_slice_columnar = orig
    assert rows == scalar


def _norm_cigar(cigar):
    if cigar is None:
        return None
    merged = []
    for n, op in cram._cigar_ops(cigar):
        if merged and merged[-1][1] == op:
            merged[-1] = (merged[-1][0] + n, op)
        else:
            merged.append((n, op))
    return "".join(f"{n}{o}" for n, o in merged) or None


_cigar_op = st.sampled_from("MIDSNHP")


@st.composite
def _read(draw, contigs):
    contig = draw(st.sampled_from(["chr1", "chr2", None]))
    if contig is None:
        ln = draw(st.integers(1, 20))
        seq = draw(st.one_of(st.none(), st.text("ACGT", min_size=ln,
                                                max_size=ln)))
        qual = None
        if seq is not None and draw(st.booleans()):
            qual = "".join(
                chr(33 + draw(st.integers(0, 60))) for _ in range(ln)
            )
        return ("u", 4, None, 0, 0, None, None, 0, 0, seq, qual, None)
    ref = contigs[contig]
    pos = draw(st.integers(1, len(ref) - 100))
    ops = []
    read_len = 0
    n_ops = draw(st.integers(1, 4))
    for k in range(n_ops):
        op = draw(_cigar_op) if k or n_ops > 1 else "M"
        ln = draw(st.integers(1, 12))
        ops.append((ln, op))
        if op in "MIS":
            read_len += ln
    if not any(op in "MIS" for _, op in ops):
        ops.append((5, "M"))
        read_len += 5
    cigar = "".join(f"{n}{o}" for n, o in ops)
    seq = "".join(draw(st.sampled_from("ACGT")) for _ in range(read_len))
    qual = None
    if draw(st.booleans()):
        qual = "".join(chr(33 + draw(st.integers(0, 40)))
                       for _ in range(read_len))
    tags = {"NM": f"i:{draw(st.integers(0, 9))}"} if draw(
        st.booleans()
    ) else None
    return ("m", 0, contig, pos, draw(st.integers(0, 60)), cigar,
            None, 0, 0, seq, qual, tags)


@given(st.data())
@settings(max_examples=25, deadline=None)
def test_property_parity(tmp_path_factory, data):
    tmp = tmp_path_factory.mktemp("cramprop")
    fasta, contigs = _mk_fasta(tmp, seed=9)
    n = data.draw(st.integers(1, 25))
    rows = []
    for i in range(n):
        r = data.draw(_read(contigs))
        rows.append((f"{r[0]}{i}",) + r[1:])
    for ref_path in (None, fasta):
        for qm in ("stored", "qq"):
            fast, scalar, fired = _decode_both(rows, REFS,
                                               ref_fasta_path=ref_path,
                                               qual_mode=qm)
            assert fast == scalar
            # and the decode is a true roundtrip of the encoded reads
            assert [f[9] for f in fast] == [r[9] for r in rows]
            # cigars normalize (adjacent same ops merge in CRAM's model)
            assert [f[5] for f in fast] == [_norm_cigar(r[5]) for r in rows]
            assert [f[10] for f in fast] == [r[10] for r in rows]


def test_constant_huffman_series():
    """Single-symbol HUFFMAN series (zero core bits — the htsjdk/htslib
    encoding for constant columns) synthesize constant arrays in the
    columnar path instead of forcing a scalar fallback."""
    import numpy as np

    from hadoop_bam_spark.formats.cram import write_itf8
    from hadoop_bam_spark.formats.cram_vec import _Series, _Unsupported

    # huffman params: alphabet [42], code lengths [0]
    params = write_itf8(1) + write_itf8(42) + write_itf8(1) + write_itf8(0)

    class Comp:
        data_series = {"RL": (3, params), "FC": (3, params)}

    S = _Series(Comp(), {})
    assert list(S.ints("RL", 5)) == [42] * 5
    assert list(S.raw("FC", 3)) == [42] * 3
    # multi-symbol huffman must still fall back
    params2 = (write_itf8(2) + write_itf8(1) + write_itf8(2)
               + write_itf8(2) + write_itf8(1) + write_itf8(1))

    class Comp2:
        data_series = {"RL": (3, params2)}

    import pytest as _pytest
    with _pytest.raises(_Unsupported):
        _Series(Comp2(), {}).ints("RL", 5)


def test_high_phred_roundtrip():
    """Stored phreds >= 223 decode to codepoints past latin-1 (chr(q+33));
    the encode fast path must fall back per-char, not crash."""
    hi = "".join(chr(33 + q) for q in (250, 255, 222, 223, 10))
    rows = [("r0", 4, None, 0, 0, None, None, 0, 0, "ACGTA", hi, None)]
    fast, scalar, _ = _decode_both(rows, REFS)
    assert fast == scalar
    assert fast[0][10] == hi


def test_qq_quality_stretch_parity():
    """'q'/QQ coverage (r6): whole-read quality stretches decode columnar
    with exact scalar parity — including phred-0 bytes (the reason QQ is
    length-prefixed), mixed mapped shapes, records without quals, and an
    unmapped record that keeps QS storage."""
    rows = [
        ("q0", 0, "chr1", 5, 60, "8M", None, 0, 0, "ACGTACGT", "!IJ!ABC!", {}),
        ("q1", 16, "chr2", 10, 30, "4M2I4M", None, 0, 0,
         "AAAACCGGGG", "IIIIHHGGGG", {}),
        ("q2", 0, "chr1", 50, 20, "2S5M3D3M", None, 0, 0,
         "TTACGTAGCA", "##FFFFFFFF", {}),
        ("q3", 0, "chr2", 99, 10, "4M", None, 0, 0, "ACAC", None, {}),
        ("u0", 4, None, 0, 0, None, None, 0, 0, "GGCC", "!#!#", {}),
    ] * 20
    rows = [(f"{r[0]}_{i}",) + r[1:] for i, r in enumerate(rows)]
    fast, scalar, fired = _decode_both(rows, REFS, qual_mode="qq")
    assert fired > 0  # the columnar path must COVER this, not fall back
    assert fast == scalar == rows
