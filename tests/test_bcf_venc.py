"""Vectorized BCF encode parity: bcf_venc.BCFBatchEncoder blobs must be
byte-identical to formats/bcf.py:encode_record per row, over hypothesis
variant batches, slicing offsets, and degenerate shapes; plus the sink's
VecUnsupported scalar fallback."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_bam_spark.formats import bcf
from hadoop_bam_spark.formats.bcf_venc import BCFBatchEncoder, VecUnsupported
from tests.test_bcf_vec import HDR_TEXT, _variant

ARROW_SCHEMA = pa.schema(
    [
        ("contig", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("id", pa.string()),
        ("ref", pa.string()),
        ("alts", pa.list_(pa.string())),
        ("qual", pa.float64()),
        ("filters", pa.list_(pa.string())),
        ("info", pa.map_(pa.string(), pa.string())),
        (
            "genotypes",
            pa.list_(
                pa.struct(
                    [
                        ("sample", pa.string()),
                        ("gt", pa.string()),
                        ("fields", pa.map_(pa.string(), pa.string())),
                    ]
                )
            ),
        ),
    ]
)


def _to_batch(rows):
    pydata = [
        {
            "contig": r[0], "start": r[1], "end": r[2], "id": r[3],
            "ref": r[4], "alts": r[5], "qual": r[6], "filters": r[7],
            "info": r[8],
            "genotypes": None
            if r[9] is None
            else [
                {"sample": g[0], "gt": g[1], "fields": g[2]} for g in r[9]
            ],
        }
        for r in rows
    ]
    return pa.RecordBatch.from_pylist(pydata, schema=ARROW_SCHEMA)


def _scalar_blob(rows, hdr):
    return b"".join(bcf.encode_record(r, hdr) for r in rows)


def _assert_parity(rows):
    hdr = bcf.parse_bcf_header_text(HDR_TEXT)
    batch = _to_batch(rows)
    blob, lens, _coords = BCFBatchEncoder(hdr).encode_batch(batch)
    ref = _scalar_blob(rows, hdr)
    if blob != ref:
        off = 0
        for i, r in enumerate(rows):
            rb = bcf.encode_record(r, hdr)
            assert blob[off: off + len(rb)] == rb, (
                f"record {i}: {rb.hex()} != {blob[off: off + len(rb)].hex()}"
            )
            off += len(rb)
    assert int(lens.sum()) == len(ref)


@given(st.lists(_variant(), min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_property_parity(rows):
    _assert_parity(rows)


def test_edge_shapes():
    base = ("chr1", 10, 10, None, "A", None, None, None, None, None)
    rows = [
        base,
        ("chr1", 1, 1, "", "A", [], 0.0, [], {}, []),
        # ID lengths straddling every descriptor width
        ("chr2", 5, 8, "x" * 14, "ACGT", ["A"], 1.5, ["PASS"], {"DP": "7"},
         [("S1", "0/1", {"GT": "0/1"})]),
        ("chr2", 5, 8, "y" * 15, "ACGT", ["A"], None, None, None, None),
        ("chr2", 5, 8, "z" * 127, "A", None, None, None, None, None),
        ("chr2", 5, 8, "w" * 128, "A", None, None, None, None, None),
        ("chr2", 5, 8, "v" * 1000, "A", None, None, None, None, None),
        # negative / large INFO ints, flags, floats, strings
        ("chr1", 99, 99, "rs1", "C", ["G", "T"], 3.25,
         ["PASS", "q10"],
         {"DP": "-50000", "DB": "true", "AF": "0.5,0.25", "SRC": "a,b"},
         [("S1", None, {"DP": "1"}), ("S2", "1|1", {"GT": "1|1"}),
          ("S3", None, None)]),
    ]
    _assert_parity(rows)


def test_sliced_batch_parity():
    """Arrow slice offsets (non-zero .offset on every nested buffer) must
    not shift any section."""
    rows = [
        ("chr1", i + 1, i + 1, f"rs{i}", "A", ["G"], 30.0, ["PASS"],
         {"DP": str(i % 10)}, [("S1", "0/1", {"GT": "0/1", "DP": str(i)})])
        for i in range(50)
    ]
    hdr = bcf.parse_bcf_header_text(HDR_TEXT)
    batch = _to_batch(rows)
    sliced = batch.slice(17, 21)
    blob, _, _ = BCFBatchEncoder(hdr).encode_batch(sliced)
    assert blob == _scalar_blob(rows[17:38], hdr)


def test_huge_string_raises_vecunsupported():
    hdr = bcf.parse_bcf_header_text(HDR_TEXT)
    rows = [("chr1", 1, 1, "q" * 40_000, "A", None, None, None, None, None)]
    with pytest.raises(VecUnsupported):
        BCFBatchEncoder(hdr).encode_batch(_to_batch(rows))


@pytest.mark.parametrize(
    "row",
    [
        # null alts element: [None] would collapse with []
        ("chr1", 5, 5, None, "A", [None], None, None, None, None),
        # null filters element
        ("chr1", 5, 5, None, "A", ["G"], None, ["PASS", None], None, None),
    ],
    ids=["null-alt-elem", "null-filt-elem"],
)
def test_null_children_raise_vecunsupported(row):
    """Null-bearing alts / filters must NOT be silently
    dictionary-collapsed onto the empty shape's bytes (VERDICT r7 #1a) —
    the batch must reject so the sink's scalar fallback encodes it.
    (Null FORMAT *values* are handled vectorized since r9 — see
    test_null_format_value_vectorized_parity.)"""
    hdr = bcf.parse_bcf_header_text(HDR_TEXT)
    # pair the null-bearing row with its empty-shape collapse partner so
    # the dictionary would actually merge them if unguarded
    partner = ("chr1", 6, 6, None, "A", [], None, [], None,
               [("S1", None, {})])
    with pytest.raises(VecUnsupported):
        BCFBatchEncoder(hdr).encode_batch(_to_batch([partner, row]))


def _uniform_rows(variants):
    """Rows whose every (record, sample) fields map shares one key
    sequence — the shape the r9 numpy indiv fast path targets."""
    rows = []
    for i, genos in enumerate(variants):
        rows.append(
            ("chr1", 10 + i, 10 + i, None, "A", ["G"], None, None, None,
             genos)
        )
    return rows


class TestIndivUniformFastPath:
    """r9 numpy indiv encoder: byte parity with encode_indiv on the
    uniform-FORMAT shape, correct bail-out to the dictionary path
    otherwise."""

    def _fast(self, rows):
        import pyarrow as pa

        hdr = bcf.parse_bcf_header_text(HDR_TEXT)
        enc = BCFBatchEncoder(hdr)
        batch = _to_batch(rows)
        geno = batch.column(batch.schema.get_field_index("genotypes"))
        if isinstance(geno, pa.ChunkedArray):
            geno = geno.combine_chunks()
        return enc._indiv_uniform_fast(geno, batch.num_rows)

    def test_triggers_on_uniform_and_matches(self):
        rows = _uniform_rows([
            [("S1", "0/1", {"GT": "0/1", "DP": "12", "PL": "0,30,255"}),
             ("S2", "1|1", {"GT": "1|1", "DP": None, "PL": "10,0,."})],
            [("S1", ".", {"GT": ".", "DP": "99", "PL": None}),
             ("S2", None, {"GT": None, "DP": ".", "PL": "1,2"})],
            # values crossing the int8 and int16 bounds force per-record
            # int16/int32 payloads
            [("S1", "0/0", {"GT": "0/0", "DP": "-121", "PL": "128,5"}),
             ("S2", "0/0", {"GT": "0/0", "DP": "40000", "PL": "0,0,0"})],
            [("S1", "0/0", {"GT": "0/0", "DP": "2", "PL": "70000"}),
             ("S2", "0/0", {"GT": "0/0", "DP": "-32001", "PL": "3"})],
        ])
        assert self._fast(rows) is not None
        _assert_parity(rows)

    def test_varying_keys_across_records_grouped(self):
        """Key sequences varying ACROSS records (each record internally
        uniform — the single-sample VCF-text shape) take the r9 grouped
        path: still vectorized, byte-identical."""
        rows = _uniform_rows([
            [("S1", "0/1", {"GT": "0/1", "DP": "12"})],
            [("S1", "0/1", {"GT": "0/1", "GQ": "30"})],  # different key
            [("S1", None, {})],                          # empty map group
            [("S1", "1/1", {"GT": "1/1", "DP": "300", "PL": "0,.,5"})],
            [("S1", "0/1", {"GT": "0/1", "DP": None})],
        ])
        assert self._fast(rows) is not None
        _assert_parity(rows)

    def test_within_record_disagreement_takes_union_path(self):
        """Samples of ONE record with different key sets take the r11
        union expansion (absent key -> all-EOV cell, scalar
        ``fm.get`` semantics) and stay vectorized."""
        rows = _uniform_rows([
            [("S1", "0/1", {"GT": "0/1", "DP": "12"}),
             ("S2", "0/1", {"GT": "0/1"})],  # DP absent in S2
            # reversed discovery order in another record: its own union
            # (DP before GT among non-GT? GT is hoisted; first-seen for
            # the rest) — distinct pattern group
            [("S1", "0/0", {"DP": "7"}),
             ("S2", "0/0", {"GT": "0/0", "DP": "8"})],
        ])
        assert self._fast(rows) is not None
        _assert_parity(rows)

    def test_exotic_gt_takes_general_parse(self):
        # ploidy 3, multi-digit alleles, mixed phasing, missing alleles
        rows = _uniform_rows([
            [("S1", "0/1/1", {"GT": "0/1/1"}),
             ("S2", "0|1|2", {"GT": "0|1|2"})],
            [("S1", "10/1", {"GT": "10/1"}),
             ("S2", "./12", {"GT": "./12"})],
            # allele index 64 -> code 130 crosses int8: per-record int16
            [("S1", "64/0", {"GT": "64/0"}),
             ("S2", "0/0", {"GT": "0/0"})],
            [("S1", "0/1/2/3", {"GT": "0/1/2/3"}),
             ("S2", ".", {"GT": "."})],
        ])
        assert self._fast(rows) is not None
        _assert_parity(rows)

    def test_over_32_key_sequences_takes_dictionary_path(self):
        """A text-imported cohort with 8+ FORMAT keys produces more than
        32 distinct per-record key sequences (uniform within each
        record): the grouped path bails to the unique-combo DICTIONARY
        path, which r11 measured 3.7x FASTER than routing through the
        union expansion here (low-cardinality values amortize the
        per-unique scalar encode; ~34 records/group cannot amortize the
        per-group vector overhead). This pins the measured routing and
        byte parity."""
        import random as _random

        from hadoop_bam_spark.formats import bcf as B

        hdr_text = (
            "##fileformat=VCFv4.2\n"
            "##contig=<ID=chr1,length=100000>\n"
            '##FILTER=<ID=PASS,Description="d">\n'
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="d">\n'
            + "".join(
                f'##FORMAT=<ID=K{i},Number=1,Type=Integer,Description="d">\n'
                for i in range(7)
            )
            + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
              "\tS1\tS2\n"
        )
        hdr = B.parse_bcf_header_text(hdr_text)
        rng = _random.Random(5)
        rows = []
        seqs = set()
        for i in range(600):
            keys = ["GT"] + [f"K{j}" for j in range(7) if rng.random() < 0.5]
            seqs.add(tuple(keys))
            genos = []
            for s in ("S1", "S2"):
                fields = {}
                for k in keys:
                    fields[k] = (rng.choice(["0/0", "0/1", "./."])
                                 if k == "GT"
                                 else str(rng.randrange(0, 99)))
                genos.append((s, fields.get("GT"), fields))
            rows.append(
                ("chr1", 10 + i, 10 + i, None, "A", ["G"], None, None,
                 None, genos)
            )
        assert len(seqs) > 32  # the shape under test
        hdr2 = hdr
        batch = _to_batch(rows)
        enc = BCFBatchEncoder(hdr2)
        blob, _, _ = enc.encode_batch(batch)
        assert enc.last_indiv_path == "dict"
        want = b"".join(B.encode_record(r, hdr2) for r in rows)
        assert blob == want

    def test_gt_garbage_still_bails(self):
        # non-numeric allele: the scalar raises; vectorized must not
        # silently encode — dictionary path surfaces the same error
        a = _uniform_rows([[("S1", "a/b", {"GT": "a/b"})]])
        assert self._fast(a) is None

    def test_gt_int64_overflow_bails_not_arrow_error(self):
        """An allele index wider than int64 must bail (None) so the
        scalar path raises the documented error — not die mid-vector
        with a raw pyarrow ArrowInvalid (r11 ADVICE)."""
        big = "99999999999999999999/1"  # 20 digits > int64 max
        a = _uniform_rows([[("S1", big, {"GT": big})]])
        assert self._fast(a) is None

    def test_empty_string_key_does_not_pass_as_empty_map(self):
        """An empty-string FORMAT key produces the same '' key-sequence
        signature as an empty map. A group mixing both shapes must BAIL
        (r9 ADVICE) — the old first-record shortcut silently encoded the
        keyed records as empty indiv when the empty map sorted first."""
        rows = _uniform_rows([
            [("S1", None, {})],        # genuinely empty map
            [("S1", None, {"": "5"})],  # empty-string key, same signature
        ])
        assert self._fast(rows) is None

    def test_all_empty_group_still_fast(self):
        rows = _uniform_rows([
            [("S1", None, {})],
            [("S1", "0/1", {"GT": "0/1"})],
            [("S1", None, {})],
        ])
        assert self._fast(rows) is not None
        _assert_parity(rows)

    def test_float_and_string_values_fast(self):
        """Per-record type selection parity: the scalar tries int, then
        float, then string PER RECORD — a column mixing '5' and '0.5'
        encodes record A as an int vector and record B as floats."""
        rows = _uniform_rows([
            [("S1", None, {"AB": "0.5"})],           # float
            [("S1", None, {"AB": "5"})],             # int (same key!)
            [("S1", None, {"AB": "0.25,0.75"})],     # float vector
            [("S1", None, {"AB": "."})],             # missing
            [("S1", None, {"AB": None})],            # absent
            [("S1", None, {"AB": "-1e3"})],          # exponent float
            [("S1", None, {"AB": "PASS;q10"})],      # string (FT-like)
            [("S1", None, {"AB": ""})],              # empty -> string path
        ])
        assert self._fast(rows) is not None
        _assert_parity(rows)

    def test_float_string_multi_sample(self):
        rows = _uniform_rows([
            [("S1", None, {"FT": "PASS", "AB": "0.5,1.5"}),
             ("S2", None, {"FT": "q10;lowdp", "AB": None}),
             ("S3", None, {"FT": None, "AB": "2.5"})],
            [("S1", None, {"FT": ".", "AB": "3"}),
             ("S2", None, {"FT": "x", "AB": "4"}),
             ("S3", None, {"FT": "longest-string-here", "AB": "."})],
        ])
        assert self._fast(rows) is not None
        _assert_parity(rows)

    def test_weird_numeric_forms_bail(self):
        """Values python parses but the strict classifier won't (' 5',
        'nan', '1_0') must bail the batch so the scalar oracle decides."""
        for v in (" 5", "nan", "1_0", "inf", "+5"):
            rows = _uniform_rows([[("S1", None, {"AB": v})]])
            assert self._fast(rows) is None, v
            _assert_parity(rows)

    def test_gt_forms(self):
        rows = _uniform_rows([
            [("S1", g, {"GT": g})] for g in
            ["0/0", "0/1", "1/1", "0|1", "1|0", ".", "./.", ".|.",
             "9/9", "0", "1", None]
        ])
        assert self._fast(rows) is not None
        _assert_parity(rows)

    def test_single_sample_many_widths(self):
        rows = _uniform_rows([
            [("S1", None, {"HQ": "1"})],
            [("S1", None, {"HQ": "1,2,3,4,5"})],
            [("S1", None, {"HQ": None})],
            [("S1", None, {"HQ": "."})],
            [("S1", None, {"HQ": "-1,."})],
        ])
        assert self._fast(rows) is not None
        _assert_parity(rows)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_indiv_uniform_property_parity(data):
    """Random uniform-key batches: fast-path container bytes must equal
    the scalar oracle byte-for-byte."""
    rng = data.draw(st.randoms(use_true_random=False))
    n = data.draw(st.integers(1, 12))
    n_samples = data.draw(st.integers(1, 3))
    keysets = [
        ("GT",), ("DP",), ("GT", "DP"), ("GT", "DP", "PL"),
        ("DP", "HQ"), ("GT", "GQ", "HQ"), (),
    ]
    # per_record=True exercises the r9 grouped path (key sequences vary
    # across records, uniform within each); per_sample=True the r11
    # union path (key sets vary WITHIN a record)
    per_record = data.draw(st.booleans())
    per_sample = data.draw(st.booleans())
    # exotic GT shapes (ploidy > 2, multi-digit alleles) drive the r11
    # general GT parse
    exotic_gt = data.draw(st.booleans())
    keyset = data.draw(st.sampled_from(keysets[:-1]))

    def gt():
        base = ["0/0", "0/1", "1|1", ".", "./.", "0", None, "5|9"]
        if exotic_gt:
            base += ["0/1/2", "10|2", "./0/.", "0|1|2|3", "64/1",
                     "200|0", "12/."]
        return rng.choice(base)

    def intval(multi):
        if rng.random() < 0.25:
            return None
        if rng.random() < 0.15:
            return "."
        r = rng.random()
        if r < 0.1:  # float record (per-record type selection)
            k = rng.randint(1, 3) if multi else 1
            return ",".join(
                rng.choice(["0.5", "-1.25", "3", "1e3", "-.5", "2."])
                for _ in range(k)
            )
        if r < 0.18:  # string record (unsplit, char-padded)
            return rng.choice(
                ["PASS", "q10;lowdp", "x", "", "a,b", "longer-string"]
            )
        k = rng.randint(1, 3) if multi else 1
        return ",".join(
            str(rng.choice([0, 5, -7, 127, 128, -121, 32768, -40000, 7]))
            for _ in range(k)
        )

    variants = []
    for _ in range(n):
        if per_record:
            keyset = rng.choice(keysets)
        genos = []
        for s in range(n_samples):
            ks = rng.choice(keysets) if per_sample else keyset
            fields = {}
            for k in ks:
                if k == "GT":
                    fields["GT"] = gt()
                else:
                    fields[k] = intval(k in ("PL", "HQ"))
            genos.append((f"S{s + 1}", fields.get("GT"), fields))
        variants.append(genos)
    _assert_parity(_uniform_rows(variants))


def test_null_format_value_vectorized_parity():
    """Null FORMAT values (the real-VCF spec-missing shape when frames
    come from parquet) stay on the vectorized path (r9: sentinel in the
    dictionary key, no per-batch bail) and every collapse-prone trio —
    {"DP": null} vs {} vs {"DP": "."} — keys distinctly, matching the
    scalar oracle byte-for-byte."""
    rows = [
        ("chr1", 5, 5, None, "A", ["G"], None, None, None,
         [("S1", None, {"DP": None})]),
        ("chr1", 6, 6, None, "A", ["G"], None, None, None,
         [("S1", None, {})]),
        ("chr1", 7, 7, None, "A", ["G"], None, None, None,
         [("S1", None, {"DP": "."})]),
        # null GT value inside an otherwise-present map
        ("chr1", 8, 8, None, "A", ["G"], None, None, None,
         [("S1", "0/1", {"GT": "0/1", "DP": None}),
          ("S2", None, {"GT": None, "DP": "3"})]),
        # every sample's every value null
        ("chr1", 9, 9, None, "A", ["G"], None, None, None,
         [("S1", None, {"DP": None, "GQ": None})]),
    ]
    _assert_parity(rows)


def test_null_format_value_distinct_scalar_bytes():
    """Sanity for the guard: the two shapes the old fill_null('') collapse
    merged really do encode differently in the scalar oracle."""
    hdr = bcf.parse_bcf_header_text(HDR_TEXT)
    a = bcf.encode_record(
        ("chr1", 5, 5, None, "A", ["G"], None, None, None,
         [("S1", None, {"DP": None})]), hdr)
    b = bcf.encode_record(
        ("chr1", 5, 5, None, "A", ["G"], None, None, None,
         [("S1", None, {})]), hdr)
    assert a != b


def test_sink_null_format_fallback_parity(spark, tmp_path, monkeypatch):
    """A corpus with null FORMAT values (vectorized since r9 via the
    key sentinel) must write bytes identical to a forced all-scalar
    write — the end-to-end sink parity the old fallback test pinned."""
    from hadoop_bam_spark import sinks
    from hadoop_bam_spark.formats.vcf import VCF_SCHEMA, VCFHeader
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    vhdr = VCFHeader()
    vhdr.lines = [
        l for l in HDR_TEXT.strip().split("\n") if l.startswith("##")
    ]
    vhdr.samples = ["S1"]
    vhdr.contigs = {"chr1": 0, "chr2": 1}
    rows = [
        ("chr1", i + 1, i + 1, f"rs{i}", "A", ["G"], 30.0, ["PASS"],
         {"DP": str(i % 10)},
         # every 7th record carries a null DP FORMAT value
         [("S1", "0/1", {"GT": "0/1", "DP": None if i % 7 == 0 else str(i)})])
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, VCF_SCHEMA).coalesce(1)
    natural = str(tmp_path / "natural.bcf")
    sinks.write_bcf(df, natural, vhdr)

    import hadoop_bam_spark.formats.bcf_venc as venc

    def boom(self, batch):
        raise venc.VecUnsupported("forced")

    monkeypatch.setattr(venc.BCFBatchEncoder, "encode_batch", boom)
    forced = str(tmp_path / "forced.bcf")
    sinks.write_bcf(df, forced, vhdr)
    with open(natural, "rb") as a, open(forced, "rb") as b:
        assert a.read() == b.read()
    got = spark.read.format("bcf").load(natural)
    assert got.count() == 100


def test_sink_fallback_parity(spark, tmp_path, monkeypatch):
    """Forcing VecUnsupported in the sink must produce a byte-identical
    file through the scalar fallback."""
    from pyspark.sql import functions as F

    from hadoop_bam_spark import sinks
    from hadoop_bam_spark.formats.vcf import VCF_SCHEMA, VCFHeader
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    vhdr = VCFHeader()
    vhdr.lines = [
        l for l in HDR_TEXT.strip().split("\n") if l.startswith("##")
    ]
    vhdr.samples = ["S1", "S2", "S3"]
    vhdr.contigs = {"chr1": 0, "chr2": 1}
    rows = [
        ("chr1", i + 1, i + 1, f"rs{i}", "A", ["G"], 30.0, ["PASS"],
         {"DP": str(i % 10)},
         [("S1", "0/1", {"GT": "0/1"}), ("S2", None, {"DP": "4"}),
          ("S3", "1|1", {"GT": "1|1"})])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, VCF_SCHEMA).coalesce(1)
    fast = str(tmp_path / "fast.bcf")
    slow = str(tmp_path / "slow.bcf")
    sinks.write_bcf(df, fast, vhdr)

    import hadoop_bam_spark.formats.bcf_venc as venc

    def boom(self, batch):
        raise venc.VecUnsupported("forced")

    monkeypatch.setattr(venc.BCFBatchEncoder, "encode_batch", boom)
    sinks.write_bcf(df, slow, vhdr)
    with open(fast, "rb") as a, open(slow, "rb") as b:
        assert a.read() == b.read()
    got = spark.read.format("bcf").load(fast)
    assert got.count() == 200


def test_inline_csi_matches_rebuild(spark, tmp_path):
    """The .csi built inline from per-part stats during executor writes
    must be byte-identical to build_csi's post-pass over the merged file,
    across multiple parts (cross-part chunk adjacency + voffset rebase)."""
    from hadoop_bam_spark import sinks
    from hadoop_bam_spark.formats import csi as csi_mod
    from hadoop_bam_spark.formats.vcf import VCF_SCHEMA, VCFHeader
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    vhdr = VCFHeader()
    vhdr.lines = [
        l for l in HDR_TEXT.strip().split("\n") if l.startswith("##")
    ]
    vhdr.samples = ["S1", "S2", "S3"]
    vhdr.contigs = {"chr1": 0, "chr2": 1}
    rows = [
        ("chr1" if i < 3000 else "chr2", i % 3000 + 1, i % 3000 + 1,
         f"rs{i}", "A", ["G"], 30.0, ["PASS"], {"DP": str(i % 10)},
         [("S1", "0/1", {"GT": "0/1"}), ("S2", None, {"DP": "4"}),
          ("S3", "1|1", {"GT": "1|1"})])
        for i in range(6000)
    ]
    df = (
        spark.createDataFrame(rows, VCF_SCHEMA)
        .sortWithinPartitions("contig", "start")
        .coalesce(4)
    )
    path = str(tmp_path / "multi.bcf")
    sinks.write_bcf(df, path, vhdr, index_csi=True)
    with open(path + ".csi", "rb") as fh:
        import gzip

        inline = gzip.decompress(fh.read())
    rebuilt = csi_mod.build_csi(path).to_bytes()
    assert inline == rebuilt
    # and the index actually prunes: an interval read returns the rows
    got = (
        spark.read.format("bcf")
        .option("intervals", "chr2:100-200")
        .option("split_size", "4000")
        .load(path)
        .count()
    )
    want = sum(
        1 for r in rows if r[0] == "chr2" and r[1] <= 200 and r[2] >= 100
    )
    assert got == want and want > 0
