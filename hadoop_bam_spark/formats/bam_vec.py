"""Vectorized (columnar) BAM record decode — numpy over block buffers.

The scan hot loop. Instead of `struct.unpack`-per-record tuples
(formats/bam.py:decode_record — kept for encode round-trips, the split
guesser, and single-record uses), partitions decode thousands of records at
once straight into Arrow arrays:

- record bodies for a batch are joined into ONE contiguous buffer; the
  32-byte fixed prefixes (refID/pos/l_read_name/mapq/bin/n_cigar/flag/
  l_seq/next_refID/next_pos/tlen) are gathered with a single fancy-index
  and reinterpreted through a structured dtype — no per-record unpack;
- variable-width sections (qname / cigar ops / packed seq / qual) are
  gathered with one repeat/cumsum index per section and turned into Arrow
  StringArrays via ``from_buffers`` — per-record Python objects are never
  built for them;
- sequence nibbles decode via ``bytes.hex()`` + ``str.translate`` (the hex
  digit of each nibble IS its 4-bit code, so hex → base is one C-speed
  table pass);
- residual predicates (unmapped-only, contig pre-check, interval overlap
  with CIGAR reference-length arithmetic) evaluate as numpy masks BEFORE
  any string column is built.

Fills the role of htsjdk's BAMRecordCodec inner loop behind the reference's
record reader (BAMRecordReader.java:226-235) — the reference gets this
speed from JVM bytecode; we get it from batch vectorization.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np

from hadoop_bam_spark.formats import bgzf
from hadoop_bam_spark.formats.bam import CIGAR_OPS, SEQ_CODE, _decode_tags

#: The BAM fixed record prefix, exactly 32 bytes (SAM spec §4.2).
PREFIX_DTYPE = np.dtype(
    [
        ("ref_id", "<i4"),
        ("pos", "<i4"),
        ("l_read_name", "u1"),
        ("mapq", "u1"),
        ("bin", "<u2"),
        ("n_cigar", "<u2"),
        ("flag", "<u2"),
        ("l_seq", "<i4"),
        ("next_ref", "<i4"),
        ("next_pos", "<i4"),
        ("tlen", "<i4"),
    ]
)
assert PREFIX_DTYPE.itemsize == 32

#: hex digit -> base char: a packed-seq byte's hex repr is (high nibble,
#: low nibble) in order, which is exactly BAM's base order.
_HEX_TO_BASE = str.maketrans("0123456789abcdef", SEQ_CODE)

#: cigar op index -> does the op consume reference bases (M/D/N/=/X)?
_CONSUMES_REF = np.zeros(16, dtype=bool)
for _i, _c in enumerate(CIGAR_OPS):
    _CONSUMES_REF[_i] = _c in "MDN=X"

_CIGAR_CHARS = np.array(list(CIGAR_OPS) + ["?"] * (16 - len(CIGAR_OPS)))


def iter_body_batches(f, vstart: int, vend: int, batch_records: int = 8192):
    """Yield (buffer, starts, lens) batches covering every record whose
    START virtual offset is in [vstart, vend).

    Record bodies are contiguous in the decompressed BGZF payload stream, so
    a batch is simply the joined block payloads plus two int arrays marking
    each owned record's body — no per-record objects, one tight
    boundary-walking loop (read the int32 length, hop). ``buffer`` may carry
    trailing bytes past the last record (a partial next record); decoders
    only touch [start, start+len) regions. Ownership/stop handling follows
    the same voffset rule as the row path (BAMRecordReader.java:226-235).
    """
    cstart, ustart = bgzf.split_voffset(vstart)
    cend, uend = bgzf.split_voffset(vend)
    segs: list = []          # contiguous payload segments
    seg_starts: list = []    # absolute stream offset of each segment start
    blocks: list = []        # (stream_start, coffset, intra0), oldest first
    total_end = 0            # stream offset past last appended byte
    base = 0                 # stream offset of segs[0][0]
    starts: list = []
    lens: list = []
    cur = 0                  # stream offset of the next record boundary
    unpack = struct.unpack
    unpack_from = struct.unpack_from

    def read4(o: int) -> bytes:
        i = len(segs) - 1
        while seg_starts[i] > o:
            i -= 1
        out = b""
        while len(out) < 4 and i < len(segs):
            rel = o + len(out) - seg_starts[i]
            out += bytes(segs[i][rel : rel + 4 - len(out)])
            i += 1
        return out

    def flush():
        nonlocal segs, seg_starts, base, starts, lens
        joined = b"".join(segs)
        st = np.asarray(starts, dtype=np.int64) - base
        ln = np.asarray(lens, dtype=np.int64)
        starts = []
        lens = []
        rem = joined[cur - base :]
        segs = [rem] if rem else []
        seg_starts = [cur] if rem else []
        base = cur
        return joined[: len(joined)], st, ln

    stop = False
    for coffset, payload in bgzf.iter_blocks(f, cstart):
        if not payload:
            continue
        intra0 = ustart if coffset == cstart else 0
        if intra0 >= len(payload):
            continue  # start boundary canonicalizes to the next block
        if intra0:
            payload = payload[intra0:]
        segs.append(payload)
        seg_starts.append(total_end)
        blocks.append((total_end, coffset, intra0))
        total_end += len(payload)
        # prune blocks fully behind the walk cursor
        while len(blocks) > 1 and blocks[1][0] <= cur:
            blocks.pop(0)
        seg = segs[-1]
        seg_start = seg_starts[-1]
        seg_end = total_end
        while cur + 4 <= total_end:
            if coffset >= cend:
                # stop checks only matter once blocks reach the end block
                bi = len(blocks) - 1
                while blocks[bi][0] > cur:
                    bi -= 1
                bstart, bco, bintra0 = blocks[bi]
                if bco > cend or (
                    bco == cend and (cur - bstart + bintra0) >= uend
                ):
                    stop = True
                    break
            if cur >= seg_start and cur + 4 <= seg_end:
                (bs,) = unpack_from("<i", seg, cur - seg_start)
            else:
                (bs,) = unpack("<i", read4(cur))
            if cur + 4 + bs > total_end:
                break  # record not fully buffered yet
            starts.append(cur + 4)
            lens.append(bs)
            cur += 4 + bs
        if stop:
            break
        if len(starts) >= batch_records:
            yield flush()
    if starts:
        yield flush()


def iter_bodies_span(f, vstart: int, vend: int) -> Iterator:
    """Yield raw record bodies (length prefix stripped, as memoryviews or
    bytes) for every record whose START virtual offset is in [vstart, vend)
    — the split ownership rule (reference BAMRecordReader.java:226-235).

    Walks whole decompressed BGZF blocks instead of issuing two
    ``BGZFReader.read`` calls per record; a record's start voffset is
    (block_coffset, intra_block_offset), with the canonical position of an
    end-of-block boundary being the next block's start (same convention as
    BGZFReader.tell_voffset).
    """
    cstart, ustart = bgzf.split_voffset(vstart)
    cend, uend = bgzf.split_voffset(vend)
    head = b""  # partial 4-byte length prefix carried across blocks
    body: Optional[bytearray] = None  # partial body carried across blocks
    body_need = 0
    for coffset, payload in bgzf.iter_blocks(f, cstart):
        n = len(payload)
        if n == 0:
            continue  # EOF-marker / empty block
        pos = ustart if coffset == cstart else 0
        mv = memoryview(payload)
        while pos < n:
            if body is not None:
                take = min(body_need, n - pos)
                body += mv[pos : pos + take]
                pos += take
                body_need -= take
                if body_need == 0:
                    yield bytes(body)
                    body = None
                continue
            if head:
                take = 4 - len(head)
                head += payload[pos : pos + take]
                pos += take
                if len(head) < 4:
                    break  # block exhausted mid-prefix
                (bs,) = struct.unpack("<i", head)
                head = b""
                body = bytearray()
                body_need = bs
                continue
            # Fresh record starting at (coffset, pos): ownership check.
            if coffset > cend or (coffset == cend and pos >= uend):
                return
            if n - pos >= 4:
                (bs,) = struct.unpack_from("<i", payload, pos)
                end = pos + 4 + bs
                if end <= n:
                    yield mv[pos + 4 : end]
                    pos = end
                else:
                    body = bytearray(mv[pos + 4 :])
                    body_need = bs - (n - pos - 4)
                    pos = n
            else:
                head = bytes(mv[pos:])
                pos = n
    # Truncated trailing record at EOF: dropped, matching the row path.


def _gather(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray):
    """Concatenate buf[starts[i] : starts[i]+lens[i]] for all i.

    Returns (values uint8 array, offsets int64 array of len n+1) — the
    standard repeat/cumsum variable-slice gather, one vector op per step.
    Index arrays are int32 (batch buffers are far below 2 GiB), halving
    the memory traffic of the hot fancy-index.
    """
    n = len(starts)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint8), offsets
    off32 = offsets.astype(np.int32)
    src = np.arange(total, dtype=np.int32)
    src -= np.repeat(off32[:-1], lens)
    src += np.repeat(starts.astype(np.int32), lens)
    return buf[src], offsets


def _validity(null_mask: Optional[np.ndarray], n: int):
    """Arrow validity-bitmap buffer (or None when nothing is null)."""
    import pyarrow as pa

    if null_mask is None or not null_mask.any():
        return None, 0
    valid = np.packbits(~null_mask, bitorder="little")
    return pa.py_buffer(valid.tobytes()), int(null_mask.sum())


def _string_array(vals: np.ndarray, offsets: np.ndarray,
                  null_mask: Optional[np.ndarray] = None):
    """uint8 values + int64 offsets -> Arrow string array (zero-copy-ish).

    Falls back to per-record latin-1 decode if any byte is non-ASCII
    (Arrow utf8 must not carry latin-1 high bytes; BAM names/quals are
    ASCII in practice, so the fallback is cold).
    """
    import pyarrow as pa

    n = len(offsets) - 1
    if vals.size and int(vals.max()) >= 128:
        out = []
        bs = vals.tobytes()
        for i in range(n):
            if null_mask is not None and null_mask[i]:
                out.append(None)
            else:
                out.append(bs[offsets[i] : offsets[i + 1]].decode("latin-1"))
        return pa.array(out, type=pa.string())
    nulls, null_count = _validity(null_mask, n)
    return pa.StringArray.from_buffers(
        n,
        pa.py_buffer(offsets.astype(np.int32).tobytes()),
        pa.py_buffer(vals.tobytes()),
        nulls,
        null_count,
    )


class BAMBatchDecoder:
    """Columnar decoder bound to one file's reference dictionary.

    ``decode(bodies, ...)`` -> dict of SAM column name -> pyarrow array for
    the requested ``fields`` (any subset of the 12 SAM columns), after
    applying the optional vectorized predicates.
    """

    def __init__(self, refs: list, fields: Optional[list] = None):
        self.refs = refs
        self.fields = list(fields) if fields is not None else [
            "qname", "flag", "rname", "pos", "mapq", "cigar",
            "rnext", "pnext", "tlen", "seq", "qual", "tags",
        ]
        # ref-id -> name lookup with one extra slot for invalid ids -> None
        self._names = np.array(
            [name for name, _ in refs] + [None], dtype=object
        )
        self._nref = len(refs)

    def _ref_names(self, rid: np.ndarray):
        import pyarrow as pa

        safe = np.where((rid >= 0) & (rid < self._nref), rid, self._nref)
        return pa.array(self._names[safe], type=pa.string())

    def decode(
        self,
        bodies: list,
        unmapped_only: bool = False,
        ref_ids: Optional[set] = None,
        intervals_by_rid: Optional[list] = None,
    ) -> Optional[dict]:
        """bodies: raw record bodies (bytes/memoryview, no length prefix).

        Convenience wrapper over :meth:`decode_span` for body lists (tests,
        single-record uses); the scan hot path feeds ``decode_span`` with
        the (buffer, starts, lens) batches from :func:`iter_body_batches`.
        """
        if not bodies:
            return None
        buf = b"".join(bodies)
        lens = np.fromiter((len(b) for b in bodies), np.int64, len(bodies))
        starts = np.zeros(len(bodies), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        return self.decode_span(buf, starts, lens, unmapped_only=unmapped_only,
                                ref_ids=ref_ids,
                                intervals_by_rid=intervals_by_rid)

    def decode_span(
        self,
        buf: bytes,
        starts: np.ndarray,
        lens: np.ndarray,
        unmapped_only: bool = False,
        ref_ids: Optional[set] = None,
        intervals_by_rid: Optional[list] = None,
    ) -> Optional[dict]:
        """Record bodies at buf[starts[i] : starts[i]+lens[i]] -> columns.

        Returns {column -> pyarrow array} for self.fields, or None when the
        batch filters down to zero rows. ``intervals_by_rid`` is a list of
        (ref_id, start, stop) 1-based inclusive intervals; a record passes
        if it overlaps any (same residual the row path applied).
        """
        if len(starts) == 0:
            return None
        arr = np.frombuffer(buf, dtype=np.uint8)
        prefix = (
            arr[starts[:, None] + np.arange(32, dtype=np.int64)]
            .copy()
            .view(PREFIX_DTYPE)
            .reshape(-1)
        )

        rid = prefix["ref_id"]
        n_cigar = prefix["n_cigar"].astype(np.int64)
        pos1 = prefix["pos"] + 1  # 1-based; -1 (unmapped) -> 0

        # --- vectorized predicates --------------------------------------
        mask = None
        if unmapped_only:
            mask = rid == -1
        if ref_ids is not None:
            m = np.isin(rid, np.fromiter(ref_ids, np.int64, len(ref_ids))) \
                if ref_ids else np.zeros(len(rid), dtype=bool)
            mask = m if mask is None else (mask & m)
        if intervals_by_rid is not None:
            l_read_name = prefix["l_read_name"].astype(np.int64)
            cigar_start = starts + 32 + l_read_name
            ops_bytes, cig_off = _gather(arr, cigar_start, 4 * n_cigar)
            ops = ops_bytes.view("<u4")
            contrib = (ops >> 4).astype(np.int64) * _CONSUMES_REF[ops & 0xF]
            cs = np.zeros(len(contrib) + 1, dtype=np.int64)
            np.cumsum(contrib, out=cs[1:])
            cig_cnt_off = (cig_off // 4).astype(np.int64)
            reflen = cs[cig_cnt_off[1:]] - cs[cig_cnt_off[:-1]]
            reflen = np.maximum(reflen, 1)
            end1 = pos1 + reflen - 1
            m = np.zeros(len(rid), dtype=bool)
            for irid, istart, istop in intervals_by_rid:
                m |= (rid == irid) & (pos1 <= istop) & (istart <= end1)
            mask = m if mask is None else (mask & m)
        if mask is not None:
            if not mask.any():
                return None
            sel = np.flatnonzero(mask)
            starts, lens, prefix = starts[sel], lens[sel], prefix[sel]
            rid = prefix["ref_id"]
            n_cigar = prefix["n_cigar"].astype(np.int64)
            pos1 = prefix["pos"] + 1

        # --- derived section offsets ------------------------------------
        l_read_name = prefix["l_read_name"].astype(np.int64)
        l_seq = prefix["l_seq"].astype(np.int64)
        nb = (l_seq + 1) // 2
        name_start = starts + 32
        cigar_start = name_start + l_read_name
        seq_start = cigar_start + 4 * n_cigar
        qual_start = seq_start + nb
        tag_start = qual_start + l_seq
        rec_end = starts + lens

        import pyarrow as pa

        out: dict = {}
        for f in self.fields:
            if f == "qname":
                vals, off = _gather(arr, name_start, l_read_name - 1)
                out[f] = _string_array(vals, off)
            elif f == "flag":
                out[f] = pa.array(prefix["flag"].astype(np.int32))
            elif f == "rname":
                out[f] = self._ref_names(rid)
            elif f == "pos":
                out[f] = pa.array(pos1.astype(np.int32))
            elif f == "mapq":
                out[f] = pa.array(prefix["mapq"].astype(np.int32))
            elif f == "cigar":
                out[f] = self._cigar_column(arr, cigar_start, n_cigar)
            elif f == "rnext":
                out[f] = self._ref_names(prefix["next_ref"])
            elif f == "pnext":
                nxt = prefix["next_pos"]
                out[f] = pa.array(
                    np.where(nxt >= 0, nxt + 1, 0).astype(np.int32)
                )
            elif f == "tlen":
                out[f] = pa.array(prefix["tlen"].astype(np.int32))
            elif f == "seq":
                out[f] = self._seq_column(arr, seq_start, nb, l_seq)
            elif f == "qual":
                out[f] = self._qual_column(arr, qual_start, l_seq)
            elif f == "tags":
                out[f] = self._tags_column(buf, arr, tag_start, rec_end)
            else:
                raise ValueError(f"unknown SAM column {f!r}")
        # SAM spec 4.2.2 long-CIGAR reconstitution: a 2-op sentinel
        # `<l_seq>S<x>N` whose record carries a CG:B,I tag means the real
        # cigar overflowed uint16 n_cigar_op (ultralong reads; htsjdk does
        # the same swap). The candidate probe is three compares over the
        # (rare) 2-op records; the per-record patch only runs on hits.
        if "cigar" in out or "tags" in out:
            two = np.flatnonzero(n_cigar == 2)
            if len(two):
                ob, _ = _gather(
                    arr, cigar_start[two], np.full(len(two), 8, np.int64)
                )
                w = ob.view("<u4").reshape(-1, 2)
                pat = (
                    ((w[:, 0] & 0xF) == 4)
                    & ((w[:, 0] >> 4) == l_seq[two])
                    & ((w[:, 1] & 0xF) == 3)
                )
                if bool(pat.any()):
                    self._reconstitute_long_cigars(
                        out, buf, tag_start, rec_end, two[pat]
                    )
        return out

    @staticmethod
    def _reconstitute_long_cigars(out, buf, tag_start, rec_end, cand):
        """Swap sentinel cigars for their CG-tag ops and drop CG from the
        tag maps — per-record Python on the handful of hit rows only."""
        import pyarrow as pa

        from hadoop_bam_spark.formats import bam as B

        fixes = {}
        for i in cand.tolist():
            tags = B._decode_tags(
                bytes(buf[int(tag_start[i]): int(rec_end[i])])
            )
            cg = tags.get("CG")
            if cg is not None:
                fixes[int(i)] = B.cg_tag_to_cigar(cg)
        if not fixes:
            return
        if "cigar" in out:
            vals = out["cigar"].to_pylist()
            for i, c in fixes.items():
                vals[i] = c
            out["cigar"] = pa.array(vals, type=pa.string())
        if "tags" in out:
            t = out["tags"].to_pylist()
            for i in fixes:
                ent = t[i]
                t[i] = (
                    {k: v for k, v in ent.items() if k != "CG"}
                    if isinstance(ent, dict)
                    else [kv for kv in ent if kv[0] != "CG"]
                )
            out["tags"] = pa.array(t, type=out["tags"].type)

    def _cigar_column(self, arr, cigar_start, n_cigar):
        """n_cigar==0 -> null (SAM '*'); ops render as count+opchar pieces
        built with one vectorized int->str conversion. Single-op cigars
        (the common aligned-read case) skip the per-record join entirely."""
        import pyarrow as pa

        n = len(cigar_start)
        ops_bytes, off = _gather(arr, cigar_start, 4 * n_cigar)
        if ops_bytes.size == 0:
            return pa.nulls(n, type=pa.string())
        ops = ops_bytes.view("<u4")
        pieces = np.char.add((ops >> 4).astype("U9"), _CIGAR_CHARS[ops & 0xF])
        if bool((n_cigar <= 1).all()):
            out = np.full(n, None, dtype=object)
            out[n_cigar == 1] = pieces.astype(object)
            return pa.array(out, type=pa.string())
        plist = pieces.tolist()
        bounds = (off // 4).astype(np.int64)
        out = [
            "".join(plist[a:b]) if b > a else None
            for a, b in zip(bounds[:-1].tolist(), bounds[1:].tolist())
        ]
        return pa.array(out, type=pa.string())

    def _seq_column(self, arr, seq_start, nb, l_seq):
        """Packed nibbles -> base string. hex() emits (high, low) nibble
        chars per byte = BAM base order; translate maps nibble hex -> base.
        Odd-length records' trailing pad char is dropped with one mask."""
        packed, off = _gather(arr, seq_start, nb)
        decoded = packed.tobytes().hex().translate(_HEX_TO_BASE)
        chars = np.frombuffer(decoded.encode("ascii"), dtype=np.uint8)
        odd = (l_seq & 1).astype(bool)
        if odd.any():
            keep = np.ones(len(chars), dtype=bool)
            keep[2 * off[1:][odd] - 1] = False
            chars = chars[keep]
        offsets = np.zeros(len(l_seq) + 1, dtype=np.int64)
        np.cumsum(l_seq, out=offsets[1:])
        return _string_array(chars, offsets, null_mask=(l_seq == 0))

    def _qual_column(self, arr, qual_start, l_seq):
        """phred+33 text; null when l_seq==0 or stored qual is 0xFF-missing."""
        first = arr[np.minimum(qual_start, len(arr) - 1)]
        null = (l_seq == 0) | (first == 0xFF)
        eff = np.where(null, 0, l_seq)
        raw, offsets = _gather(arr, qual_start, eff)
        vals = np.minimum(raw.astype(np.int16) + 33, 255).astype(np.uint8)
        return _string_array(vals, offsets, null_mask=null)

    def _tags_column(self, buf, arr, tag_start, rec_end):
        """Aux tags -> map<string,string>.

        Fast path: real BAMs overwhelmingly carry the SAME tag structure on
        every record (same tags, same wire types, fixed widths — e.g.
        ``NM:i MD:Z`` from one aligner). When every record's tag block has
        equal length and fixed-width-only types matching the first record's
        layout, values extract as matrix columns with one vectorized
        int->str conversion per tag. Anything else (Z/H/B strings, mixed
        layouts) falls back to the per-record parser."""
        import pyarrow as pa

        n = len(tag_start)
        tlen = rec_end - tag_start
        if n == 0 or int(tlen.max()) == 0:
            offsets = np.zeros(n + 1, dtype=np.int32)
            return pa.MapArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array([], type=pa.string()),
                pa.array([], type=pa.string()),
            )
        if bool((tlen == tlen[0]).all()):
            fast = self._tags_fixed_fast(arr, tag_start, int(tlen[0]), n)
            if fast is not None:
                return fast
        keys: list = []
        vals: list = []
        offsets = np.zeros(n + 1, dtype=np.int32)
        ts, te = tag_start.tolist(), rec_end.tolist()
        for i in range(n):
            a, b = ts[i], te[i]
            if b > a:
                for k, v in _decode_tags(buf[a:b]).items():
                    keys.append(k)
                    vals.append(v)
            offsets[i + 1] = len(keys)
        return pa.MapArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(keys, type=pa.string()),
            pa.array(vals, type=pa.string()),
        )

    _FIXED_TAG_WIDTH = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4}
    _FIXED_TAG_DTYPE = {"c": "<i1", "C": "<u1", "s": "<i2", "S": "<u2",
                        "i": "<i4", "I": "<u4"}

    def _tags_fixed_fast(self, arr, tag_start, L, n):
        """Vectorized tag decode for a constant fixed-width layout, or None
        when the layout doesn't qualify / rows disagree with row 0."""
        import pyarrow as pa

        mat = arr[tag_start[:, None].astype(np.int32)
                  + np.arange(L, dtype=np.int32)]
        row0 = bytes(mat[0])
        fields = []  # (tag, typ, value_offset)
        p = 0
        while p + 3 <= L:
            typ = chr(row0[p + 2])
            w = self._FIXED_TAG_WIDTH.get(typ)
            if w is None or p + 3 + w > L:
                return None
            fields.append((row0[p : p + 2].decode("latin-1"), typ, p + 3))
            p += 3 + w
        if p != L or not fields:
            return None
        # every row must share row 0's tag headers byte-for-byte
        hdr_pos = np.array(
            [off - 3 + j for _, _, off in fields for j in range(3)],
            dtype=np.int32,
        )
        if not bool((mat[:, hdr_pos] == mat[0, hdr_pos]).all()):
            return None
        k = len(fields)
        val_cols = np.empty((n, k), dtype=object)
        for j, (_, typ, off) in enumerate(fields):
            w = self._FIXED_TAG_WIDTH[typ]
            sub = np.ascontiguousarray(mat[:, off : off + w])
            v = sub.view(self._FIXED_TAG_DTYPE[typ]).reshape(-1)
            # plain decimal strings always re-encode as ints -> no prefix
            # needed (formats/sam.py tag_value_repr contract)
            val_cols[:, j] = v.astype("U11").astype(object)
        keys_flat = np.tile(
            np.array([t for t, _, _ in fields], dtype=object), n
        )
        offsets = np.arange(0, (n + 1) * k, k, dtype=np.int32)
        return pa.MapArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(keys_flat, type=pa.string()),
            pa.array(val_cols.reshape(-1), type=pa.string()),
        )
