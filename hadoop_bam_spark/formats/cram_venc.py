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

Scope: the RR=false (no-ref) path — the shape this engine's own sink
writes. Reference-compressed writes (``reference=``) and shapes outside
the fast path (non-ASCII seq/qual/qname, empty-but-not-null sequences)
raise :class:`VecUnsupported` and the sink falls back to the scalar
encoder. Fills the role of htsjdk's CRAM record codec behind the
reference's writer (CRAMRecordWriter.java:74-121).
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
    """Fixed per-(cigar, seq-null) feature shape of a mapped record."""

    __slots__ = (
        "fn_bytes", "fc_bytes", "fp_bytes", "dl_bytes", "rs_bytes",
        "hc_bytes", "pd_bytes", "slots", "const_arrays", "qlen", "reflen",
        "whole_seq",
    )

    def __init__(self, cigar: str, seq_null: bool):
        feats: list[tuple[str, int]] = []  # (fc, read_pos)
        #: dynamic seq slots per array stream: (stream, read_start0, n)
        self.slots: list[tuple[str, int, int]] = []
        #: constant payload bytes per array stream (seq-null I/S -> 'N'*n)
        self.const_arrays: dict[str, bytearray] = {}
        dl, rs, hc, pd = [], [], [], []
        read_pos = 1
        if cigar:
            ops, qlen, reflen = C._cigar_ops_cached(cigar)
            self.qlen, self.reflen = qlen, reflen
            for n, op in ops:
                if op in "M=X":
                    if not seq_null:
                        feats.append(("b", read_pos))
                        self.slots.append(("BB", read_pos - 1, n))
                    read_pos += n
                elif op == "I":
                    feats.append(("I", read_pos))
                    if seq_null:
                        self.const_arrays.setdefault("IN", bytearray())
                        self.const_arrays["IN"] += b"N" * n + b"\x00"
                    else:
                        self.slots.append(("IN", read_pos - 1, n))
                    read_pos += n
                elif op == "S":
                    feats.append(("S", read_pos))
                    if seq_null:
                        self.const_arrays.setdefault("SC", bytearray())
                        self.const_arrays["SC"] += b"N" * n + b"\x00"
                    else:
                        self.slots.append(("SC", read_pos - 1, n))
                    read_pos += n
                elif op == "D":
                    feats.append(("D", read_pos))
                    dl.append(n)
                elif op == "N":
                    feats.append(("N", read_pos))
                    rs.append(n)
                elif op == "H":
                    feats.append(("H", read_pos))
                    hc.append(n)
                elif op == "P":
                    feats.append(("P", read_pos))
                    pd.append(n)
                else:
                    raise VecUnsupported(f"cigar op {op!r}")
        else:
            self.qlen, self.reflen = 0, 0
            if not seq_null:
                feats.append(("b", 1))
                self.slots.append(("BB", 0, -1))  # -1 = whole read
        self.whole_seq = bool(self.slots) and self.slots[0][2] == -1
        self.fn_bytes = C.write_itf8(len(feats))
        self.fc_bytes = bytes(ord(fc) for fc, _ in feats)
        fp = bytearray()
        prev = 0
        for _, fpos in feats:
            fp += C.write_itf8(fpos - prev)
            prev = fpos
        self.fp_bytes = bytes(fp)
        self.dl_bytes = b"".join(C.write_itf8(x) for x in dl)
        self.rs_bytes = b"".join(C.write_itf8(x) for x in rs)
        self.hc_bytes = b"".join(C.write_itf8(x) for x in hc)
        self.pd_bytes = b"".join(C.write_itf8(x) for x in pd)


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
    """Columnar no-ref CRAM container encoder bound to one reference
    dictionary. ``encode_container`` consumes a pyarrow RecordBatch/Table
    slice with columns (qname, flag, rname, pos, mapq, cigar, rnext,
    pnext, tlen, seq, qual, tag_keys, tag_vals) — SAM schema with the tags
    map pre-split JVM-side (the bam_venc contract)."""

    def __init__(self, ref_index: dict, major: int = 3,
                 gzip_level: int = 6):
        self.ref_index = ref_index
        self.major = major
        self.gzip_level = gzip_level
        self._templates: dict[tuple[str, bool], _Template] = {}

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
        )
        slices = [
            self._slice_streams(ctx, lo, min(lo + step, n) or n)
            for lo in bounds
        ]
        return C.assemble_container(
            slices, tag_lines, n, record_counter, self.major, rr=False,
            gzip_level=self.gzip_level,
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

        ints["FN"] = template_stream("fn_bytes")
        ints["FP"] = template_stream("fp_bytes")
        ints["DL"] = template_stream("dl_bytes")
        ints["RS"] = template_stream("rs_bytes")
        ints["HC"] = template_stream("hc_bytes")
        ints["PD"] = template_stream("pd_bytes")
        # NF unused (detached mates), matches scalar (no NF key emitted)

        bytestreams: dict[str, bytes] = {}
        bytestreams["FC"] = template_stream("fc_bytes")
        bytestreams["BS"] = b""  # no-ref: no substitutions
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

        # BB/IN/SC: per-template slot copies from the seq buffer
        t_ids = np.unique(tcode_m) if len(tcode_m) else []
        for stream in ("BB", "IN", "SC"):
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
