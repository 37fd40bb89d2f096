"""rANS-4x8 order-0 ENCODE (formats/rans.py): roundtrip through the
engine's own spec decoder (formats/cram.py:rans_decode — the htslib
rans_static layout), freq-table edge shapes, and the CRAM ``codecs="auto"``
per-block measured selection (mirrors htsjdk's qual/flag-series rANS
routing behind CRAMRecordWriter.java:74-121)."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_bam_spark.formats.cram import (
    M_GZIP,
    M_RANS,
    rans_decode,
)
from hadoop_bam_spark.formats.rans import rans_encode_order0


class TestRansRoundtrip:
    @pytest.mark.parametrize(
        "data",
        [
            b"",
            b"\x00",                      # symbol 0 present (terminator code)
            b"\x00" * 1000,               # single symbol == terminator byte
            b"\xff" * 7,                  # top symbol
            bytes(range(256)) * 5,        # full alphabet, one 256-long run
            b"ACGT" * 123,                # consecutive-symbol RLE run
            b"A",                         # 1 symbol: freq 4096 (2-byte freq)
            b"IIIIIIIIIJ",                # heavily skewed
            bytes([0, 255]) * 50,         # far-apart symbols, no runs
        ],
        ids=[
            "empty", "zero", "zero-run", "top", "full-alpha",
            "acgt", "single", "skew", "gap",
        ],
    )
    def test_edges(self, data):
        assert rans_decode(rans_encode_order0(data), len(data)) == data

    def test_all_lengths_mod4(self):
        """The 4-lane interleave has a ragged tail for n % 4 != 0 — every
        residue class must roundtrip (the peel/unroll split in the
        encoder)."""
        rng = random.Random(5)
        for n in range(1, 66):
            data = bytes(rng.choice(b"!#%+5?I") for _ in range(n))
            assert rans_decode(rans_encode_order0(data), n) == data

    @settings(max_examples=60, deadline=None)
    @given(
        st.binary(max_size=4096)
        | st.builds(
            lambda alpha, n, seed: bytes(
                random.Random(seed).choice(alpha) for _ in range(n)
            ),
            st.sampled_from([b"!#%+5?I", b"AB", b"\x00\x01\x02"]),
            st.integers(0, 5000),
            st.integers(0, 99),
        )
    )
    def test_property(self, data):
        assert rans_decode(rans_encode_order0(data), len(data)) == data

    @pytest.mark.parametrize(
        "data",
        [
            b"", b"A", b"AB", b"ABC", b"ABCD", b"A" * 999,
            bytes(range(256)) * 3, b"ACGT" * 123, bytes([0, 255]) * 50,
        ],
        ids=["empty", "one", "two", "three", "four", "run",
             "full", "acgt", "gap"],
    )
    def test_order1_edges(self, data):
        from hadoop_bam_spark.formats.rans import rans_encode_order1

        assert rans_decode(rans_encode_order1(data), len(data)) == data

    @settings(max_examples=40, deadline=None)
    @given(
        st.binary(max_size=2048)
        | st.builds(
            lambda alpha, n, seed: bytes(
                random.Random(seed).choice(alpha) for _ in range(n)
            ),
            st.sampled_from([b"!#%+5?I", b"AB", b"\x00\x01"]),
            st.integers(0, 3000),
            st.integers(0, 99),
        )
    )
    def test_order1_property(self, data):
        from hadoop_bam_spark.formats.rans import rans_encode_order1

        assert rans_decode(rans_encode_order1(data), len(data)) == data

    def test_order1_beats_order0_on_runs(self):
        """The reason order-1 exists: run-structured streams (real phred
        shape) compress via context tables far below order-0 entropy."""
        from hadoop_bam_spark.formats.rans import (
            rans_encode_order0,
            rans_encode_order1,
        )

        rng = random.Random(7)
        buf = bytearray()
        cur = ord("I")
        for _ in range(100_000):
            if rng.random() < 0.05:
                cur = rng.choice(b"!#%+5?I")
            buf.append(cur)
        data = bytes(buf)
        o1 = rans_encode_order1(data)
        o0 = rans_encode_order0(data)
        assert len(o1) < len(o0) / 3
        assert rans_decode(o1, len(data)) == data

    def test_qual_like_beats_gzip(self):
        """The reason the codec exists: order-0 rANS beats DEFLATE's
        integer-bit Huffman on skewed small-alphabet (quality-like)
        data."""
        import gzip as _gzip

        rng = random.Random(11)
        # phred-like: few symbols, skewed
        data = bytes(
            rng.choice(b"IIIIIIHHHGG?5+") for _ in range(200_000)
        )
        r = rans_encode_order0(data)
        g = _gzip.compress(data, 6)
        assert len(r) < len(g)


def _block_methods(container: bytes) -> list[int]:
    """Block method bytes of every block in a serialized container body
    (after the container header)."""
    from hadoop_bam_spark.formats.cram import Block, ContainerHeader

    hdr = ContainerHeader.parse(container, 0, 3)
    p = hdr.header_size
    methods = []
    while p < hdr.header_size + hdr.length:
        blk, p = Block.parse(container, p, 3)
        methods.append(blk.method)
    return methods


def _qual_rows(n=400):
    # ONE rng stream: match-free skewed quals (real phred shape);
    # per-char reseeding would create LZ matches and gzip would
    # legitimately win the measured pick
    rng = random.Random(19)
    return [
        (
            f"r{i}", 0, "chr1", 1 + i, 60, "60M", None, 0, 0,
            "ACGTACGTACGT" * 5,
            "".join(rng.choices("IIIIIHHHGG?5+", k=60)),
            {},
        )
        for i in range(n)
    ]


class TestCramCodecsAuto:
    ROWS = _qual_rows()
    REFS = [("chr1", 100000)]
    RIDX = {"chr1": 0}

    def _scalar(self, codecs):
        from hadoop_bam_spark.formats import cram

        return cram.encode_container(
            self.ROWS, self.RIDX, 0, codecs=codecs
        )

    def test_auto_picks_rans_and_roundtrips(self):
        from hadoop_bam_spark.formats import cram

        auto = self._scalar("auto")
        gz = self._scalar("gzip")
        assert M_RANS in _block_methods(auto)
        assert M_RANS not in _block_methods(gz)
        assert len(auto) < len(gz)  # measured per-block pick won

        # the standard reader decodes the rANS container identically
        def decode(blob, tmp):
            p = str(tmp)
            with open(p, "wb") as f:
                cram.write_file_definition(f)
                f.write(cram.encode_header_container(
                    "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n"
                ))
                f.write(blob)
                f.write(cram.EOF_CONTAINER_V3)
            return [r[:11] for r in cram.decode_file(p)]

        import tempfile

        with tempfile.TemporaryDirectory() as td:
            a = decode(auto, td + "/a.cram")
            g = decode(gz, td + "/g.cram")
        assert a == g and len(a) == len(self.ROWS)

    def test_vec_scalar_parity_with_auto(self):
        """Both encoders share assemble_container, so the measured codec
        choice must leave them byte-identical."""
        from tests.test_cram_venc import rows_to_batch

        from hadoop_bam_spark.formats.cram_venc import CRAMColumnEncoder

        vec = CRAMColumnEncoder(self.RIDX, codecs="auto").encode_container(
            rows_to_batch(self.ROWS), 0
        )
        assert vec == self._scalar("auto")


# ---------------------------------------------------------------------------
# decoder implementations: scalar (reference) vs numpy lockstep vs native
# ---------------------------------------------------------------------------

def _scalar_decode(blob: bytes, n: int) -> bytes:
    """The pure-Python reference body, bypassing the native fast path."""
    import struct

    from hadoop_bam_spark.formats.cram import _rans_decode_body

    if not blob:
        return b""
    try:
        return _rans_decode_body(blob, blob[0], n)
    except (IndexError, struct.error):
        raise ValueError("truncated rANS block") from None


@pytest.fixture
def numpy_only(monkeypatch):
    """Force decode_batch onto the numpy/scalar paths."""
    from hadoop_bam_spark.formats import rans_native

    monkeypatch.setattr(rans_native, "_lib", None)
    monkeypatch.setattr(rans_native, "_failed", True)


def _corpus(seed, count, max_n=3000):
    rng = random.Random(seed)
    datas = []
    for t in range(count):
        n = rng.randrange(max_n)
        kind = t % 4
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            data = bytes(rng.choice(b"IIIIIHHHGG?5+") for _ in range(n))
        elif kind == 2:
            data = (b"ABBBBCCCCCCCD" * (n // 13 + 1))[:n]
        else:
            data = b"\x07" * n
        datas.append(data)
    return datas


class TestDecodeBatch:
    """rans_vec.decode_batch: lockstep parity vs the scalar reference
    decoder on mixed batches (the CRAM scan feeds it every rANS block
    of a 48 MB container read-ahead in one call)."""

    def test_lockstep_parity_mixed(self, numpy_only):
        from hadoop_bam_spark.formats import rans_vec
        from hadoop_bam_spark.formats.rans import (
            rans_encode_order0,
            rans_encode_order1,
        )

        datas = _corpus(23, 80)
        blobs = []
        for i, d in enumerate(datas):
            enc = rans_encode_order0 if i % 2 else rans_encode_order1
            blobs.append((enc(d), len(d)))
        got = rans_vec.decode_batch(blobs)
        assert got == datas

    def test_small_batch_falls_to_scalar(self, numpy_only):
        from hadoop_bam_spark.formats import rans_vec
        from hadoop_bam_spark.formats.rans import rans_encode_order0

        datas = _corpus(29, 5)
        got = rans_vec.decode_batch(
            [(rans_encode_order0(d), len(d)) for d in datas]
        )
        assert got == datas

    def test_raw_size_mismatch(self, numpy_only):
        from hadoop_bam_spark.formats import rans_vec
        from hadoop_bam_spark.formats.rans import rans_encode_order0

        e = rans_encode_order0(b"hello world")
        with pytest.raises(ValueError, match="mismatch"):
            rans_vec.decode_batch([(e, 10)])

    def test_truncated_item_poisons_batch(self, numpy_only):
        """One truncated stream in a lockstep batch raises (the scan
        aborts either way); valid-only batches stay fine."""
        from hadoop_bam_spark.formats import rans_vec
        from hadoop_bam_spark.formats.rans import rans_encode_order0

        datas = [
            bytes(random.Random(i).choice(b"!#%+5?I") for _ in range(2000))
            for i in range(25)
        ]
        blobs = [(rans_encode_order0(d), 2000) for d in datas]
        bad = blobs[7][0]
        blobs[7] = (bad[: len(bad) // 2], 2000)
        with pytest.raises(ValueError):
            rans_vec.decode_batch(blobs)

    def test_truncation_agrees_with_scalar_sampled_offsets(self,
                                                           numpy_only):
        """Cut one stream of a lockstep batch at sampled offsets: the
        batch must raise exactly when the scalar reference raises on
        that stream, and agree on bytes when both tolerate the cut."""
        from hadoop_bam_spark.formats import rans_vec
        from hadoop_bam_spark.formats.rans import (
            rans_encode_order0,
            rans_encode_order1,
        )

        rng = random.Random(41)
        data = bytes(rng.choice(b"!#%+5?I") for _ in range(300))
        fill = [
            bytes(random.Random(100 + i).choice(b"!#%+5?I")
                  for _ in range(300))
            for i in range(24)
        ]
        for enc in (rans_encode_order0, rans_encode_order1):
            e = enc(data)
            fill_blobs = [(enc(d), 300) for d in fill]
            for cut in range(9, len(e), 7):
                blob = e[:cut]
                try:
                    want = _scalar_decode(blob, 300)
                    want_err = False
                except ValueError:
                    want_err = True
                try:
                    got = rans_vec.decode_batch(
                        [(blob, None)] + fill_blobs
                    )[0]
                    got_err = False
                except ValueError:
                    got_err = True
                assert got_err == want_err, (enc.__name__, cut)
                if not want_err:
                    assert got == want, (enc.__name__, cut)

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 10**6))
    def test_property_lockstep_vs_scalar(self, seed):
        from hadoop_bam_spark.formats import rans_native, rans_vec
        from hadoop_bam_spark.formats.rans import (
            rans_encode_order0,
            rans_encode_order1,
        )

        saved = (rans_native._lib, rans_native._failed)
        rans_native._lib, rans_native._failed = None, True
        try:
            rng = random.Random(seed)
            datas = _corpus(seed, rng.randrange(21, 40), max_n=800)
            blobs = []
            for i, d in enumerate(datas):
                enc = rans_encode_order0 if (seed + i) % 2 else (
                    rans_encode_order1
                )
                blobs.append((enc(d), len(d)))
            assert rans_vec.decode_batch(blobs) == datas
        finally:
            rans_native._lib, rans_native._failed = saved


class TestNativeDecoder:
    """Optional ctypes kernel (formats/rans_native.py): byte parity
    with the scalar reference and identical truncation errors."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from hadoop_bam_spark.formats import rans_native

        if not rans_native.available():
            pytest.skip("no C compiler in this environment")

    def test_parity(self):
        from hadoop_bam_spark.formats import rans_native
        from hadoop_bam_spark.formats.rans import (
            rans_encode_order0,
            rans_encode_order1,
        )

        for d in _corpus(31, 40):
            for enc in (rans_encode_order0, rans_encode_order1):
                e = enc(d)
                if not e:
                    continue
                assert rans_native.decode(e[9:], e[0], len(d)) == d

    def test_decode_only_prebuilt_so_degrades_gracefully(
        self, tmp_path, monkeypatch
    ):
        """A pre-r11 .so shipped via SPARK_GRAFT_RANS_SO has the decode
        symbols but not the encode walks: decode must stay native while
        the encoders fall back to the Python walk with identical
        output."""
        import subprocess

        from hadoop_bam_spark.formats import rans_native
        from hadoop_bam_spark.formats.rans import (
            rans_encode_order0,
            rans_encode_order1,
        )

        # build a decode-only kernel: strip the encode walks from the
        # current source (they sit between the marker comment and
        # rans_decode1's definition)
        src_txt = rans_native._C_SOURCE
        cut0 = src_txt.index("/* ---- encode-side state walks")
        cut1 = src_txt.index("int rans_decode1(")
        old_src = src_txt[:cut0] + src_txt[cut1:]
        assert "rans_encode0_walk" not in old_src
        src = tmp_path / "old.c"
        so = tmp_path / "old.so"
        src.write_text(old_src)
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", str(so), str(src)],
            check=True, capture_output=True, timeout=60,
        )
        # reference outputs from the CURRENT configuration first
        data = bytes(random.Random(11).choice(b"!#%+5?I") for _ in range(500))
        want0, want1 = rans_encode_order0(data), rans_encode_order1(data)
        monkeypatch.setenv("SPARK_GRAFT_RANS_SO", str(so))
        monkeypatch.setattr(rans_native, "_lib", None)
        monkeypatch.setattr(rans_native, "_failed", False)
        try:
            lib = rans_native._load()
            assert lib is not None and not lib._has_encode
            assert rans_native.encode_walk(b"xx", 0, b"", b"") is None
            # encoders fall back to the Python walk — identical bytes
            assert rans_encode_order0(data) == want0
            assert rans_encode_order1(data) == want1
            # decode still native through the old kernel
            assert rans_native.decode(want0[9:], 0, len(data)) == data
            assert rans_native.decode(want1[9:], 1, len(data)) == data
        finally:
            rans_native._lib = None
            rans_native._failed = False

    def test_encode_walk_byte_parity_with_python(self, monkeypatch):
        """r11: the native ENCODE walk must emit exactly the bytes the
        pure-Python walk emits (same tables, exact integer arithmetic)
        for both orders across the adversarial corpus."""
        from hadoop_bam_spark.formats import rans_native
        from hadoop_bam_spark.formats.rans import (
            rans_encode_order0,
            rans_encode_order1,
        )

        corpus = _corpus(53, 25)
        native = [
            (rans_encode_order0(d), rans_encode_order1(d)) for d in corpus
        ]
        monkeypatch.setattr(rans_native, "_lib", None)
        monkeypatch.setattr(rans_native, "_failed", True)
        for d, (n0, n1) in zip(corpus, native):
            assert rans_encode_order0(d) == n0
            assert rans_encode_order1(d) == n1

    def test_every_offset_truncation_agrees_with_scalar(self):
        """Truncate a valid stream at EVERY offset: the native kernel
        must raise exactly when the scalar reference raises, and agree
        byte-for-byte whenever both tolerate the cut (order-1's tail
        renorm is allowed to run dry)."""
        from hadoop_bam_spark.formats import rans_native
        from hadoop_bam_spark.formats.rans import (
            rans_encode_order0,
            rans_encode_order1,
        )

        rng = random.Random(37)
        data = bytes(rng.choice(b"!#%+5?I") for _ in range(200))
        for enc in (rans_encode_order0, rans_encode_order1):
            e = enc(data)
            for cut in range(9, len(e)):
                blob = e[:cut]
                try:
                    want = _scalar_decode(blob, len(data))
                    want_err = False
                except ValueError:
                    want_err = True
                try:
                    got = rans_native.decode(blob[9:], blob[0], len(data))
                    got_err = False
                except ValueError:
                    got_err = True
                assert got_err == want_err, (enc.__name__, cut)
                if not want_err:
                    assert got == want, (enc.__name__, cut)
