"""Vectorized (columnar) CRAM container encode — the write-side twin of
``formats/cram_vec.py`` and the mirror of ``formats/bam_venc.py`` /
``formats/bcf_venc.py``.

Instead of the per-record ``encode_slice`` loop (formats/cram.py — kept as
the parity oracle, the reference-compressed RR=true path, and the fallback
for shapes this path rejects), a whole Arrow batch encodes each slice's
data-series streams columnar:

- all itf8 integer series (BF/CF/RI/RL/AP/RG/MF/NS/NP/TS/TL/MQ) write
  through one vectorized itf8 stream builder (length masks + scatters);
- CIGAR strings are dictionary-encoded into FEATURE TEMPLATES: one scalar
  parse per UNIQUE (cigar, seq-null) shape yields the fixed FN/FC/FP/
  DL/RS/HC/PD bytes and the (start, length) sequence slots; per-record
  bytes then gather from the template piece tables, and the b/I/S payload
  streams copy straight out of the Arrow seq buffer with ramp indices;
- QS translates the qual buffer through a 256-byte LUT; RN/BA are ramp
  copies with stop bytes scattered;
- tag (key, value) pairs dictionary-encode so only UNIQUE values pay
  ``_encode_tag_value``; TL line keys compose per record via one Arrow
  ``binary_join`` and the per-(tag,type) external blocks gather from the
  unique-wire piece table;
- the assembled per-slice stream dicts feed the SAME
  ``cram.assemble_container`` tail as the scalar path, so container bytes
  are identical by construction (property-tested in
  tests/test_cram_venc.py).

Scope: BOTH reference modes. RR=false (no-ref, verbatim sequences) is
the shape this engine's own sink defaults to; RR=true
(reference-compressed, ``reference=`` — the shape real CRAM archives
use) batch-compares M/=/X bases against whole-contig numpy buffers and
materializes only mismatch features (r8; see ``CRAMColumnEncoder`` and
``_rr_features``). Shapes outside the fast path (non-ASCII
seq/qual/qname, empty-but-not-null sequences) raise
:class:`VecUnsupported` and the sink falls back to the scalar encoder.
Fills the role of htsjdk's CRAM record codec behind the reference's
writer (CRAMRecordWriter.java:74-121).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from hadoop_bam_spark.formats import cram as C
from hadoop_bam_spark.formats.bam import _encode_tag_value
from hadoop_bam_spark.formats.bam_venc import (
    _exclusive_cumsum,
    _int_col,
    _ramp,
    _string_parts,
)
from hadoop_bam_spark.formats.bcf_venc import (
    _abs_offsets,
    _combined,
    _dict_encode_keys,
    _PieceTable,
)


class VecUnsupported(ValueError):
    """Batch shape outside the vectorized encode fast path."""


#: phred+33 -> raw LUT matching cram._phred_encode's latin-1 translate
_QS_LUT = np.array(
    [(c - 33) & 0xFF for c in range(256)], dtype=np.uint8
)

_ITF8_NEG1 = C.write_itf8(-1)


def _build_sub_lut() -> np.ndarray:
    """(ref_byte, read_byte) -> BS substitution code under the fixed
    matrix, -1 = inexpressible ('b' verbatim-base feature instead).
    Exactly ``cram._sub_code`` as a 256x256 table: a non-ACGTN reference
    byte uses the N row, a read byte outside the ref's alt set maps -1."""
    lut = np.full((256, 256), -1, np.int8)
    for rb in range(256):
        r = "ACGTN".find(chr(rb))
        alts = C._SUB_ALTS["ACGTN"[r] if r >= 0 else "N"]
        for j, ab in enumerate(alts):
            lut[rb, ord(ab)] = j
    return lut


_SUB_LUT = _build_sub_lut()


def itf8_stream(vals: np.ndarray) -> np.ndarray:
    """Vectorized itf8 encode of an int array -> one uint8 stream
    (byte-identical to ``b''.join(write_itf8(v) for v in vals)``)."""
    v = vals.astype(np.int64) & 0xFFFFFFFF
    lens = np.select(
        [v < 0x80, v < 0x4000, v < 0x200000, v < 0x10000000],
        [1, 2, 3, 4],
        5,
    )
    starts = _exclusive_cumsum(lens)
    out = np.empty(int(starts[-1]), np.uint8)
    starts = starts[:-1]
    m = lens == 1
    out[starts[m]] = v[m]
    m = lens == 2
    s, w = starts[m], v[m]
    out[s] = 0x80 | (w >> 8)
    out[s + 1] = w & 0xFF
    m = lens == 3
    s, w = starts[m], v[m]
    out[s] = 0xC0 | (w >> 16)
    out[s + 1] = (w >> 8) & 0xFF
    out[s + 2] = w & 0xFF
    m = lens == 4
    s, w = starts[m], v[m]
    out[s] = 0xE0 | (w >> 24)
    out[s + 1] = (w >> 16) & 0xFF
    out[s + 2] = (w >> 8) & 0xFF
    out[s + 3] = w & 0xFF
    m = lens == 5
    s, w = starts[m], v[m]
    out[s] = 0xF0 | (w >> 28)
    out[s + 1] = (w >> 20) & 0xFF
    out[s + 2] = (w >> 12) & 0xFF
    out[s + 3] = (w >> 4) & 0xFF
    out[s + 4] = w & 0x0F
    return out


class _Template:
    """Fixed per-(cigar, seq-null) feature shape of a mapped record.

    Besides the RR=false byte streams (fn/fc/fp/...), the template carries
    the RR=true decomposition: ``rr_*`` arrays hold the fixed (cigar-
    determined) features MINUS the 'b' M-stretches — under reference
    compression those become data-dependent X/b singles — and ``ms_*``
    arrays describe each M/=/X stretch (emit key = cigar op index,
    0-based read start, 0-based ref offset from POS, length; -1 = whole
    read for the empty-cigar case) so the encoder can batch-compare read
    bases against the reference."""

    __slots__ = (
        "fn_bytes", "fc_bytes", "fp_bytes", "dl_bytes", "rs_bytes",
        "hc_bytes", "pd_bytes", "slots", "const_arrays", "qlen", "reflen",
        "whole_seq",
        "fb_fc", "fb_rp", "fb_key", "fb_bstart", "fb_blen",
        "rr_fc", "rr_rp", "rr_key",
        "ms_key", "ms_read0", "ms_ref0", "ms_n",
    )

    def __init__(self, cigar: str, seq_null: bool):
        #: (fc, read_pos, op_key, b_start0, b_len) — full/class-b variant;
        #: b_len 0 = no BB payload, -1 = whole read
        feats: list[tuple[str, int, int, int, int]] = []
        m_segs: list[tuple[int, int, int, int]] = []
        #: dynamic seq slots per array stream: (stream, read_start0, n)
        self.slots: list[tuple[str, int, int]] = []
        #: constant payload bytes per array stream (seq-null I/S -> 'N'*n)
        self.const_arrays: dict[str, bytearray] = {}
        dl, rs, hc, pd = [], [], [], []
        read_pos = 1
        ref_off = 0
        if cigar:
            ops, qlen, reflen = C._cigar_ops_cached(cigar)
            self.qlen, self.reflen = qlen, reflen
            for key, (n, op) in enumerate(ops):
                if op in "M=X":
                    if not seq_null:
                        feats.append(("b", read_pos, key, read_pos - 1, n))
                        self.slots.append(("BB", read_pos - 1, n))
                        m_segs.append((key, read_pos - 1, ref_off, n))
                    read_pos += n
                    ref_off += n
                elif op == "I":
                    feats.append(("I", read_pos, key, 0, 0))
                    if seq_null:
                        self.const_arrays.setdefault("IN", bytearray())
                        self.const_arrays["IN"] += b"N" * n + b"\x00"
                    else:
                        self.slots.append(("IN", read_pos - 1, n))
                    read_pos += n
                elif op == "S":
                    feats.append(("S", read_pos, key, 0, 0))
                    if seq_null:
                        self.const_arrays.setdefault("SC", bytearray())
                        self.const_arrays["SC"] += b"N" * n + b"\x00"
                    else:
                        self.slots.append(("SC", read_pos - 1, n))
                    read_pos += n
                elif op == "D":
                    feats.append(("D", read_pos, key, 0, 0))
                    dl.append(n)
                    ref_off += n
                elif op == "N":
                    feats.append(("N", read_pos, key, 0, 0))
                    rs.append(n)
                    ref_off += n
                elif op == "H":
                    feats.append(("H", read_pos, key, 0, 0))
                    hc.append(n)
                elif op == "P":
                    feats.append(("P", read_pos, key, 0, 0))
                    pd.append(n)
                else:
                    raise VecUnsupported(f"cigar op {op!r}")
        else:
            self.qlen, self.reflen = 0, 0
            if not seq_null:
                feats.append(("b", 1, 0, 0, -1))
                self.slots.append(("BB", 0, -1))  # -1 = whole read
                m_segs.append((0, 0, 0, -1))
        self.whole_seq = bool(self.slots) and self.slots[0][2] == -1
        self.fn_bytes = C.write_itf8(len(feats))
        self.fc_bytes = bytes(ord(fc) for fc, *_ in feats)
        fp = bytearray()
        prev = 0
        for _, fpos, *_ in feats:
            fp += C.write_itf8(fpos - prev)
            prev = fpos
        self.fp_bytes = bytes(fp)
        self.dl_bytes = b"".join(C.write_itf8(x) for x in dl)
        self.rs_bytes = b"".join(C.write_itf8(x) for x in rs)
        self.hc_bytes = b"".join(C.write_itf8(x) for x in hc)
        self.pd_bytes = b"".join(C.write_itf8(x) for x in pd)
        # RR=true decomposition as numpy arrays, gather-ready
        self.fb_fc = np.array([ord(f[0]) for f in feats], np.uint8)
        self.fb_rp = np.array([f[1] for f in feats], np.int64)
        self.fb_key = np.array([f[2] for f in feats], np.int64)
        self.fb_bstart = np.array([f[3] for f in feats], np.int64)
        self.fb_blen = np.array(
            [f[4] if f[0] == "b" else 0 for f in feats], np.int64
        )
        rr = [f for f in feats if f[0] != "b"]
        self.rr_fc = np.array([ord(f[0]) for f in rr], np.uint8)
        self.rr_rp = np.array([f[1] for f in rr], np.int64)
        self.rr_key = np.array([f[2] for f in rr], np.int64)
        self.ms_key = np.array([s[0] for s in m_segs], np.int64)
        self.ms_read0 = np.array([s[1] for s in m_segs], np.int64)
        self.ms_ref0 = np.array([s[2] for s in m_segs], np.int64)
        self.ms_n = np.array([s[3] for s in m_segs], np.int64)


def _ascii_parts(col, n: int, what: str):
    """_string_parts + ASCII guard (the scalar path encodes latin-1; a
    non-ASCII codepoint is multi-byte in the Arrow UTF-8 buffer and would
    diverge — fall back instead)."""
    flat, lens, null, _ = _string_parts(_combined(col))
    if len(flat) and flat.max() >= 0x80:
        raise VecUnsupported(f"non-ASCII {what}")
    return flat, lens, null


def _lookup_codes(col, n: int, fn) -> np.ndarray:
    """Dictionary-encode a string column, map each UNIQUE through ``fn``
    (null -> None), gather per record."""
    import pyarrow.compute as pc

    arr = _combined(col)
    d = pc.dictionary_encode(arr)
    codes = np.asarray(d.indices.fill_null(-1)).astype(np.int64)
    uniq = d.dictionary.to_pylist()
    table = np.fromiter(
        (fn(u) for u in uniq), dtype=np.int64, count=len(uniq)
    )
    out = np.empty(len(codes), np.int64)
    mask = codes >= 0
    out[mask] = table[codes[mask]]
    out[~mask] = fn(None)
    return out


class CRAMColumnEncoder:
    """Columnar CRAM container encoder bound to one reference dictionary.
    ``encode_container`` consumes a pyarrow RecordBatch/Table slice with
    columns (qname, flag, rname, pos, mapq, cigar, rnext, pnext, tlen,
    seq, qual, tag_keys, tag_vals) — SAM schema with the tags map
    pre-split JVM-side (the bam_venc contract).

    With ``ref_fasta`` (+ ``ref_names``) the containers are
    reference-compressed (RR=true, r8): each slice's M/=/X bases are
    batch-compared against whole-contig numpy buffers
    (``FastaRef.contig_array``) and only the mismatches materialize as
    features — an 'X' substitution code through the 256x256 ``_SUB_LUT``
    when the fixed matrix can express the (ref, read) pair, a single-base
    'b' otherwise (non-ACGTN read base, or a position past the contig
    end). Output bytes are identical to the scalar
    ``cram.encode_container(..., ref_fasta=...)`` by construction
    (property-tested in tests/test_cram_venc.py). Without it, RR=false
    verbatim sequences — the original scope."""

    #: whole contigs cached as uint8 arrays; FIFO-capped (a human-scale
    #: reference is ~3 GB total — executors hold at most this many)
    _MAX_CONTIGS = 4

    def __init__(self, ref_index: dict, major: int = 3,
                 gzip_level: int = 6, ref_fasta=None,
                 ref_names: Optional[list[str]] = None,
                 embed_reference: bool = False,
                 codecs: str = "gzip"):
        self.ref_index = ref_index
        self.major = major
        self.gzip_level = gzip_level
        self.codecs = codecs
        self.ref_fasta = ref_fasta
        self.ref_names = ref_names or []
        self.embed_reference = embed_reference
        self._templates: dict[tuple[str, bool], _Template] = {}
        self._contigs: dict[int, np.ndarray] = {}

    def _contig(self, rid: int) -> np.ndarray:
        """Whole-contig uint8 buffer for a reference id; empty array for
        ids outside the name table (the scalar path's refseq='' case —
        every base becomes a 'b' feature). A name present in the header
        but absent from the FASTA raises KeyError, same as the scalar
        ``FastaRef.window``."""
        arr = self._contigs.get(rid)
        if arr is None:
            if len(self._contigs) >= self._MAX_CONTIGS:
                self._contigs.pop(next(iter(self._contigs)))
            name = (
                self.ref_names[rid]
                if 0 <= rid < len(self.ref_names)
                else None
            )
            arr = (
                np.zeros(0, np.uint8)
                if name is None
                else self.ref_fasta.contig_array(name)
            )
            self._contigs[rid] = arr
        return arr

    def _template(self, cigar: str, seq_null: bool) -> _Template:
        key = (cigar, seq_null)
        t = self._templates.get(key)
        if t is None:
            t = self._templates[key] = _Template(cigar, seq_null)
        return t

    # ------------------------------------------------------------------
    def encode_container(
        self, batch, record_counter: int, records_per_slice: int = 10000
    ) -> bytes:
        import pyarrow as pa
        import pyarrow.compute as pc

        n = batch.num_rows
        col = {
            name: batch.column(i)
            for i, name in enumerate(batch.schema.names)
        }
        flag = _int_col(col["flag"])
        pos = _int_col(col["pos"])
        mapq = _int_col(col["mapq"])
        pnext = _int_col(col["pnext"])
        tlen = _int_col(col["tlen"])
        ri = _lookup_codes(
            col["rname"], n,
            lambda u: self.ref_index.get(u, -1) if u else -1,
        )
        ns = _lookup_codes(
            col["rnext"], n,
            lambda u: self.ref_index.get(u, -1) if u else -1,
        )
        qname_flat, qname_lens, _qn_null = _ascii_parts(col["qname"], n, "qname")
        seq_flat, seq_lens, seq_null = _ascii_parts(col["seq"], n, "seq")
        qual_flat, qual_lens, qual_null = _ascii_parts(col["qual"], n, "qual")
        if ((~seq_null) & (seq_lens == 0)).any():
            raise VecUnsupported("empty (non-null) sequence")

        # templates from unique (cigar, seq-null) shapes
        cigar_arr = _combined(col["cigar"])
        d = pc.dictionary_encode(pc.fill_null(cigar_arr, ""))
        ccodes = np.asarray(d.indices).astype(np.int64)
        cuniq = d.dictionary.to_pylist()
        tcode = ccodes * 2 + seq_null  # unique per (cigar, null) pair
        tuniq_codes, tcode_compact = np.unique(tcode, return_inverse=True)
        templates = [
            self._template(cuniq[int(tc // 2)], bool(tc % 2))
            for tc in tuniq_codes
        ]
        t_qlen = np.array([t.qlen for t in templates], np.int64)
        t_reflen = np.array([t.reflen for t in templates], np.int64)
        qlen = t_qlen[tcode_compact]
        reflen = t_reflen[tcode_compact]
        rl = np.where(seq_lens > 0, seq_lens, qlen)
        mapped = (flag & 0x4) == 0
        has_cigar = np.array([bool(c) for c in cuniq])[ccodes]
        bad = mapped & has_cigar & (~seq_null) & (qlen != seq_lens)
        if bad.any():
            i = int(np.argmax(bad))
            raise ValueError(
                f"cigar query length {int(qlen[i])} != seq length "
                f"{int(seq_lens[i])}"
            )

        cf = np.full(n, C.CF_DETACHED, np.int64)
        cf |= np.where(qual_null, 0, C.CF_QUAL_STORED)
        cf |= np.where(seq_null, C.CF_NO_SEQ, 0)
        mf = ((flag & 0x20) != 0) * 1 + ((flag & 0x8) != 0) * 2
        # RR=true applies per record only when it has a place on the
        # reference (scalar by_ref: ref_id >= 0 and pos >= 1)
        byref = (
            mapped & (ri >= 0) & (pos >= 1)
            if self.ref_fasta is not None
            else None
        )

        # ---- tags: unique (key, value) wires + TL line dictionary
        (tl_codes, tag_lines, entry_codes, entry_groups, e_table,
         group_keys, tk_offs) = self._tags(col, n)

        # ---- per-slice stream assembly
        step = max(records_per_slice, 1)
        bounds = list(range(0, n, step)) or [0]
        ctx = dict(
            flag=flag, cf=cf, ri=ri, rl=rl, pos=pos, mapq=mapq, mf=mf,
            ns=ns, pnext=pnext, tlen=tlen, tl=tl_codes, mapped=mapped,
            tcode=tcode_compact, templates=templates, reflen=reflen,
            qname_flat=qname_flat, qname_lens=qname_lens,
            seq_flat=seq_flat, seq_lens=seq_lens, seq_null=seq_null,
            qual_flat=qual_flat, qual_lens=qual_lens, qual_null=qual_null,
            entry_codes=entry_codes, entry_groups=entry_groups,
            e_table=e_table, group_keys=group_keys, tk_offs=tk_offs,
            byref=byref,
        )
        slices = [
            self._slice_streams(ctx, lo, min(lo + step, n) or n)
            for lo in bounds
        ]
        if self.embed_reference and self.ref_fasta is not None:
            C.attach_embedded_refs(
                slices,
                lambda rid, lo1, hi1: self._contig(rid)[
                    lo1 - 1: hi1
                ].tobytes(),
            )
        return C.assemble_container(
            slices, tag_lines, n, record_counter, self.major,
            rr=self.ref_fasta is not None,
            gzip_level=self.gzip_level,
            codecs=self.codecs,
        )

    # ------------------------------------------------------------------
    def _tags(self, col, n: int):
        import pyarrow as pa
        import pyarrow.compute as pc

        tk = _combined(col["tag_keys"])
        tv = _combined(col["tag_vals"])
        tk_offs = _abs_offsets(tk, n)
        tv_offs = _abs_offsets(tv, n)
        if not np.array_equal(tk_offs, tv_offs):
            raise VecUnsupported("tag key/value offsets disagree")
        n_entries = int(tk_offs[-1] - tk_offs[0])
        if n_entries == 0:
            empty = np.zeros(0, np.int64)
            # every record has the empty tag line
            return (np.zeros(n, np.int64), [()], empty, empty,
                    _PieceTable([]), [], tk_offs)
        off0 = int(tk_offs[0])
        keys = pc.cast(tk.values.slice(off0, n_entries), "string")
        vals = pc.cast(tv.values.slice(off0, n_entries), "string")
        if keys.null_count or vals.null_count:
            raise VecUnsupported("null tag key/value")
        composed = pc.binary_join_element_wise(keys, vals, "\x00")
        entry_codes, e_first = _dict_encode_keys(composed)
        k_rep = keys.take(e_first).to_pylist()
        v_rep = vals.take(e_first).to_pylist()
        pieces, lk, groups_of_unique = [], [], []
        group_index: dict[tuple[str, str], int] = {}
        group_keys: list[tuple[str, str]] = []
        for k, v in zip(k_rep, v_rep):
            wire = _encode_tag_value(k, v)
            ty = chr(wire[2])
            payload = wire[3:]
            pieces.append(C.write_itf8(len(payload)) + payload)
            lk.append(k + ty)
            g = group_index.get((k, ty))
            if g is None:
                g = group_index[(k, ty)] = len(group_keys)
                group_keys.append((k, ty))
            groups_of_unique.append(g)
        e_table = _PieceTable(pieces)
        entry_groups = np.array(groups_of_unique, np.int64)[entry_codes]

        # TL: per-record line key = concat of (tag+type) of its entries
        lk_entries = pa.array(lk, pa.string()).take(entry_codes)
        rel = (tk_offs - off0).astype(np.int32)
        per_rec = pc.binary_join(
            pa.ListArray.from_arrays(rel, lk_entries), ""
        )
        tl_codes, tl_first = _dict_encode_keys(pc.fill_null(per_rec, ""))
        # rebuild each unique line's (tag, ty) tuple from its
        # representative record's entry range
        lk_np = np.array(lk, dtype=object)
        tag_lines = []
        for i in tl_first:
            i = int(i)
            lo, hi = int(rel[i]), int(rel[i + 1])
            tag_lines.append(
                tuple(
                    (s[:2], s[2]) for s in lk_np[entry_codes[lo:hi]]
                )
            )
        return (tl_codes, tag_lines, entry_codes, entry_groups, e_table,
                group_keys, tk_offs)

    # ------------------------------------------------------------------
    def _rr_features(self, ctx, lo: int, hi: int):
        """FN/FC/FP/BS/BB streams for one slice under RR=true.

        Feature emission must reproduce the scalar cigar loop exactly:
        features come out in cigar-op order, mismatches within an M
        stretch in ascending read offset. Every feature — fixed (from the
        per-template ``rr_*``/``fb_*`` arrays; by-ref records drop the 'b'
        M-stretches, off-reference mapped records keep them) and computed
        (read-vs-contig byte compare over the flattened M segments) —
        carries a sort key ``op_index * L + offset`` and a single lexsort
        by (key, record) linearizes all five streams at once."""
        templates = ctx["templates"]
        tcode = ctx["tcode"][lo:hi]
        mapped = ctx["mapped"][lo:hi]
        byref = ctx["byref"][lo:hi]
        rl = ctx["rl"][lo:hi]
        ri = ctx["ri"][lo:hi]
        pos = ctx["pos"][lo:hi]
        seq_flat = ctx["seq_flat"]
        s_starts = _exclusive_cumsum(ctx["seq_lens"])[:-1][lo:hi]
        m = hi - lo
        midx = np.where(mapped)[0]
        if self.embed_reference:
            # self-contained contract: a multiref slice has no embeddable
            # window, so demote its records to verbatim (mirrors the
            # scalar _chunk_allows_by_ref rule — parity-tested)
            rids = np.unique(ri)
            if not (len(rids) == 1 and rids[0] >= 0):
                byref = np.zeros_like(byref)

        L = int(rl.max(initial=0)) + 2  # sort-key stride; offsets < L

        rec_p, key_p, fc_p, rp_p = [], [], [], []
        bst_p, bln_p, pv_p = [], [], []
        seg_rec, seg_key, seg_r0, seg_f0, seg_n = [], [], [], [], []
        for u in (np.unique(tcode[midx]) if len(midx) else []):
            t = templates[int(u)]
            sel = midx[tcode[midx] == u]
            br = byref[sel]
            # fixed features: full variant off-reference, rr variant by-ref
            for recs, fc_a, rp_a, key_a, bs_a, bl_a in (
                (sel[~br], t.fb_fc, t.fb_rp, t.fb_key,
                 t.fb_bstart, t.fb_blen),
                (sel[br], t.rr_fc, t.rr_rp, t.rr_key, None, None),
            ):
                k = len(fc_a)
                if k == 0 or len(recs) == 0:
                    continue
                nr = len(recs)
                rec_p.append(np.repeat(recs, k))
                fc_p.append(np.tile(fc_a, nr))
                rp_p.append(np.tile(rp_a, nr))
                key_p.append(np.tile(key_a * L, nr))
                pv_p.append(np.full(k * nr, -1, np.int64))
                if bs_a is None:
                    bst_p.append(np.zeros(k * nr, np.int64))
                    bln_p.append(np.zeros(k * nr, np.int64))
                else:
                    bst = np.repeat(s_starts[recs], k) + np.tile(bs_a, nr)
                    bln = np.tile(bl_a, nr).copy()
                    whole = bln == -1
                    if whole.any():
                        bln[whole] = np.repeat(rl[recs], k)[whole]
                    bst_p.append(bst)
                    bln_p.append(bln)
            # M/=/X segments of by-ref records -> batched ref compare
            recs = sel[br]
            k = len(t.ms_key)
            if k and len(recs):
                nr = len(recs)
                seg_rec.append(np.repeat(recs, k))
                seg_key.append(np.tile(t.ms_key, nr))
                seg_r0.append(np.tile(t.ms_read0, nr))
                seg_f0.append(np.tile(t.ms_ref0, nr))
                n_t = np.tile(t.ms_n, nr).copy()
                whole = n_t == -1
                if whole.any():
                    n_t[whole] = np.repeat(rl[recs], k)[whole]
                seg_n.append(n_t)

        if seg_rec:
            sr = np.concatenate(seg_rec)
            sk = np.concatenate(seg_key)
            s0 = np.concatenate(seg_r0)
            f0 = np.concatenate(seg_f0)
            sn = np.concatenate(seg_n)
            nz = sn > 0
            sr, sk, s0, f0, sn = sr[nz], sk[nz], s0[nz], f0[nz], sn[nz]
            if len(sr):
                # Only the two gathers (read bytes, ref bytes) run at
                # per-base width; everything per-feature is recovered from
                # the ~1%-of-bases mismatch positions via searchsorted
                # into the segment boundaries — materializing per-base
                # record/key/readpos repeats measured 40% of this
                # function's time at 50k x 100 bp.
                e_src = _ramp(s_starts[sr] + s0, sn)
                e_ref = _ramp((pos[sr] - 1) + f0, sn)  # 0-based abs ref
                read_b = seq_flat[e_src]
                seg_ri = ri[sr]
                rids = np.unique(seg_ri)
                if len(rids) == 1:
                    carr = self._contig(int(rids[0]))
                    if len(carr) == 0:
                        # empty contig (zero-length FASTA entry or rid
                        # outside ref_names): every base mismatches as 'b',
                        # same as the scalar path. np.where does NOT
                        # short-circuit — indexing an empty array in the
                        # taken-or-not branch raises (r8 ADVICE).
                        ref_b = np.zeros(len(e_src), np.uint8)
                        valid = np.zeros(len(e_src), bool)
                    else:
                        valid = e_ref < len(carr)  # e_ref >= 0 (pos >= 1)
                        ref_b = np.where(
                            valid,
                            carr[np.minimum(e_ref, len(carr) - 1)],
                            np.uint8(0),
                        )
                else:
                    ref_b = np.zeros(len(e_src), np.uint8)
                    valid = np.zeros(len(e_src), bool)
                    e_ri = np.repeat(seg_ri, sn)
                    for rid in rids:
                        carr = self._contig(int(rid))
                        if len(carr) == 0:
                            continue  # ref_b/valid stay 0/False -> 'b'
                        mask = e_ri == rid
                        p = e_ref[mask]
                        v = p < len(carr)
                        ref_b[mask] = np.where(
                            v,
                            carr[np.minimum(p, len(carr) - 1)],
                            np.uint8(0),
                        )
                        valid[mask] = v
                mis = np.where((read_b != ref_b) | ~valid)[0]
                if len(mis):
                    bounds = _exclusive_cumsum(sn)  # len(sn)+1 edges
                    seg_of = np.searchsorted(bounds[1:], mis, side="right")
                    within = mis - bounds[seg_of]
                    codes = _SUB_LUT[ref_b[mis], read_b[mis]].astype(
                        np.int64
                    )
                    codes[~valid[mis]] = -1  # past contig end -> 'b'
                    is_x = codes >= 0
                    rec_p.append(sr[seg_of])
                    key_p.append(sk[seg_of] * L + within + 1)
                    fc_p.append(
                        np.where(is_x, ord("X"), ord("b")).astype(np.uint8)
                    )
                    rp_p.append(s0[seg_of] + 1 + within)  # 1-based read pos
                    pv_p.append(codes)
                    bst_p.append(np.where(is_x, 0, e_src[mis]))
                    bln_p.append((~is_x).astype(np.int64))

        if not rec_p:
            # no features anywhere, but every mapped record still gets FN=0
            fn0 = (
                itf8_stream(np.zeros(len(midx), np.int64)).tobytes()
                if len(midx)
                else b""
            )
            return fn0, b"", b"", b"", b""
        rec = np.concatenate(rec_p)
        key = np.concatenate(key_p)
        fc = np.concatenate(fc_p)
        rp = np.concatenate(rp_p)
        bst = np.concatenate(bst_p)
        bln = np.concatenate(bln_p)
        pv = np.concatenate(pv_p)
        order = np.lexsort((key, rec))
        rec, fc, rp = rec[order], fc[order], rp[order]
        bst, bln, pv = bst[order], bln[order], pv[order]
        fn = itf8_stream(np.bincount(rec, minlength=m)[midx]).tobytes()
        first = np.ones(len(rec), bool)
        first[1:] = rec[1:] != rec[:-1]
        prev = np.empty_like(rp)
        prev[0] = 0
        prev[1:] = rp[:-1]
        deltas = np.where(first, rp, rp - prev)
        fp = itf8_stream(deltas).tobytes()
        bs = pv[pv >= 0].astype(np.uint8).tobytes()
        bmask = bln > 0
        bl = bln[bmask]
        out = np.zeros(int(bl.sum()) + len(bl), np.uint8)
        dest = _exclusive_cumsum(bl + 1)[:-1]
        out[_ramp(dest, bl)] = seq_flat[_ramp(bst[bmask], bl)]
        return fn, fc.tobytes(), fp, bs, out.tobytes()

    # ------------------------------------------------------------------
    def _slice_streams(self, ctx, lo: int, hi: int) -> dict:
        templates = ctx["templates"]
        tcode = ctx["tcode"][lo:hi]
        mapped = ctx["mapped"][lo:hi]
        seq_null = ctx["seq_null"][lo:hi]
        rl = ctx["rl"][lo:hi]
        ri = ctx["ri"][lo:hi]
        pos = ctx["pos"][lo:hi]
        m = hi - lo

        ints: dict[str, bytes] = {}
        for key, arr in (
            ("BF", ctx["flag"]), ("CF", ctx["cf"]), ("RI", ctx["ri"]),
            ("RL", ctx["rl"]), ("AP", ctx["pos"]), ("MF", ctx["mf"]),
            ("NS", ctx["ns"]), ("NP", ctx["pnext"]), ("TS", ctx["tlen"]),
            ("TL", ctx["tl"]),
        ):
            ints[key] = itf8_stream(arr[lo:hi]).tobytes()
        ints["RG"] = _ITF8_NEG1 * m
        # AP stored as `pos or 0` in the scalar path; pos nulls already 0
        midx = np.where(mapped)[0]
        tcode_m = tcode[midx]
        ints["MQ"] = itf8_stream(ctx["mapq"][lo:hi][midx]).tobytes()

        def template_stream(attr: str) -> bytes:
            table = _PieceTable([getattr(t, attr) for t in templates])
            total = int(table.lens[tcode_m].sum())
            out = np.empty(total, np.uint8)
            table.scatter(
                out, tcode_m, _exclusive_cumsum(table.lens[tcode_m])[:-1]
            )
            return out.tobytes()

        rr_bb: Optional[bytes] = None
        if ctx["byref"] is None:
            ints["FN"] = template_stream("fn_bytes")
            ints["FP"] = template_stream("fp_bytes")
            fc_stream = template_stream("fc_bytes")
            bs_stream = b""  # no-ref: no substitutions
        else:
            fn, fc_stream, fp, bs_stream, rr_bb = self._rr_features(
                ctx, lo, hi
            )
            ints["FN"] = fn
            ints["FP"] = fp
        ints["DL"] = template_stream("dl_bytes")
        ints["RS"] = template_stream("rs_bytes")
        ints["HC"] = template_stream("hc_bytes")
        ints["PD"] = template_stream("pd_bytes")
        # NF unused (detached mates), matches scalar (no NF key emitted)

        bytestreams: dict[str, bytes] = {}
        bytestreams["FC"] = fc_stream
        bytestreams["BS"] = bs_stream
        # QS: every record with qual, record order
        q_lens = ctx["qual_lens"][lo:hi]
        q_starts_all = _exclusive_cumsum(ctx["qual_lens"])[:-1][lo:hi]
        src = _ramp(q_starts_all, q_lens)
        bytestreams["QS"] = _QS_LUT[ctx["qual_flat"][src]].tobytes()
        # BA: unmapped records with seq, verbatim
        s_lens_all = ctx["seq_lens"]
        s_starts_all = _exclusive_cumsum(s_lens_all)[:-1]
        umask = (~mapped) & (~seq_null)
        uidx = np.where(umask)[0]
        src = _ramp(s_starts_all[lo:hi][uidx], rl[uidx] * (~seq_null[uidx]))
        bytestreams["BA"] = ctx["seq_flat"][src].tobytes()

        arrays: dict[str, bytes] = {}
        # RN: qname + \x00
        qn_lens = ctx["qname_lens"][lo:hi]
        qn_starts = _exclusive_cumsum(ctx["qname_lens"])[:-1][lo:hi]
        out = np.zeros(int(qn_lens.sum()) + m, np.uint8)
        dest = _exclusive_cumsum(qn_lens + 1)[:-1]
        out[_ramp(dest, qn_lens)] = ctx["qname_flat"][
            _ramp(qn_starts, qn_lens)
        ]
        arrays["RN"] = out.tobytes()

        # BB/IN/SC: per-template slot copies from the seq buffer. Under
        # RR=true the BB stream is feature-driven (verbatim stretches of
        # off-reference records + single inexpressible-mismatch bases,
        # interleaved in emission order) and comes from _rr_features.
        t_ids = np.unique(tcode_m) if len(tcode_m) else []
        for stream in ("BB", "IN", "SC"):
            if stream == "BB" and rr_bb is not None:
                arrays["BB"] = rr_bb
                continue
            # per-record stream lengths
            base = np.zeros(len(templates), np.int64)
            whole = np.zeros(len(templates), bool)
            for u, t in enumerate(templates):
                L = len(t.const_arrays.get(stream, b""))
                for s, _st, nn in t.slots:
                    if s == stream:
                        L += (0 if nn == -1 else nn) + 1
                        if nn == -1:
                            whole[u] = True
                base[u] = L
            lens_r = base[tcode_m] + np.where(
                whole[tcode_m], rl[midx], 0
            )
            total = int(lens_r.sum())
            if total == 0:
                arrays[stream] = b""
                continue
            out = np.zeros(total, np.uint8)
            dest0 = _exclusive_cumsum(lens_r)[:-1]
            # scatter per template
            for u in t_ids:
                t = templates[int(u)]
                sel = np.where(tcode_m == u)[0]
                if not len(sel):
                    continue
                recs = midx[sel]  # slice-local record idx
                d = dest0[sel]
                off = 0
                cb = t.const_arrays.get(stream)
                if cb:
                    pt = _PieceTable([bytes(cb)])
                    pt.scatter(out, np.zeros(len(sel), np.int64), d)
                    continue
                for s, st, nn in t.slots:
                    if s != stream:
                        continue
                    if nn == -1:
                        ln = rl[recs]
                    else:
                        ln = np.full(len(sel), nn, np.int64)
                    src = _ramp(
                        s_starts_all[lo:hi][recs] + st, ln
                    )
                    out[_ramp(d + off, ln)] = ctx["seq_flat"][src]
                    # stop byte already zero in the zeros() buffer
                    if nn == -1:
                        off = None  # single-slot template; no follower
                        break
                    off += nn + 1
            arrays[stream] = out.tobytes()

        # tag blocks: entries of this slice's records, grouped by (tag, ty)
        tag_blocks: dict[tuple[str, str], bytes] = {}
        tk_offs = ctx["tk_offs"]
        e0, e1 = int(tk_offs[lo] - tk_offs[0]), int(tk_offs[hi] - tk_offs[0])
        if e1 > e0:
            ecodes = ctx["entry_codes"][e0:e1]
            egroups = ctx["entry_groups"][e0:e1]
            et = ctx["e_table"]
            for g, gk in enumerate(ctx["group_keys"]):
                sel = np.where(egroups == g)[0]
                if not len(sel):
                    continue
                codes = ecodes[sel]
                lens = et.lens[codes]
                buf = np.empty(int(lens.sum()), np.uint8)
                et.scatter(buf, codes, _exclusive_cumsum(lens)[:-1])
                tag_blocks[gk] = buf.tobytes()

        # slice alignment footprint
        placed = (ri >= 0) & (pos > 0)
        if placed.any():
            ends = pos + np.maximum(ctx["reflen"][lo:hi], 1) - 1
            aln_min = int(pos[placed].min())
            aln_max = int(ends[placed].max())
        else:
            aln_min = aln_max = None
        return dict(
            ints=ints, bytestreams=bytestreams, arrays=arrays,
            tag_blocks=tag_blocks, n_bases=int(rl.sum()),
            seen_refs=set(int(x) for x in np.unique(ri)),
            aln_min=aln_min, aln_max=aln_max, n=m,
        )
