"""Tabix (.tbi) index: read / write / build-from-BGZF-text / interval query.

Tabix is the generic-text sibling of BAI — identical UCSC binning + linear
index per reference, plus a small header describing which columns hold the
sequence name and coordinates.  It is the index behind the reference's VCF
bounded traversal (VCFInputFormat.java:388-472: intervals → chunk file
pointers → split overlap filtering); the VCF source uses it the same way at
plan time.

The .tbi container itself is BGZF-compressed.  ``build_tabix`` constructs
an index from any BGZF-compressed tab-text file we can read (one pass with
line-level virtual offsets), so engine-written ``.vcf.bgz`` files get real
indexes without external tooling.

Layout (htslib tabix spec):
    magic 'TBI\\1', n_ref i32,
    format i32 (1=SAM 2=VCF, |0x10000 = 0-based half-open),
    col_seq col_beg col_end i32, meta i32 (comment char), skip i32,
    l_nm i32, names (NUL-terminated, concatenated),
    per ref: n_bin, [bin u32, n_chunk, (cnk_beg u64, cnk_end u64)...],
             n_intv, [ioffset u64 ...]
    optional n_no_coor u64.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import BinaryIO, Iterator, Optional

from hadoop_bam_spark.formats import bgzf
from hadoop_bam_spark.formats.bai import (
    LINEAR_SHIFT,
    PSEUDO_BIN,
    RefIndex,
    merge_chunks,
    ref_chunks,
)
from hadoop_bam_spark.formats.bam import reg2bin

TBI_MAGIC = b"TBI\x01"

#: format codes (tabix spec)
FMT_SAM = 1
FMT_VCF = 2
FMT_ZERO_BASED = 0x10000


@dataclass
class TabixIndex:
    names: list[str]
    refs: list[RefIndex]
    fmt: int = FMT_VCF
    col_seq: int = 1
    col_beg: int = 2
    col_end: int = 0
    meta: int = ord("#")
    skip: int = 0
    n_no_coor: Optional[int] = None

    # -- binary codec (payload is BGZF-wrapped by read()/write()) ----------

    @classmethod
    def from_bytes(cls, data: bytes) -> "TabixIndex":
        try:
            return cls._from_bytes_unchecked(data)
        except (struct.error, IndexError) as e:
            # raise-don't-garbage: corrupt payload behind a valid BGZF
            # wrap (e.g. a foreign tool's layout drift) is a data error
            raise ValueError(f"truncated or corrupt tabix index: {e}") from e

    @classmethod
    def _from_bytes_unchecked(cls, data: bytes) -> "TabixIndex":
        if data[:4] != TBI_MAGIC:
            raise ValueError("not a tabix index (bad magic)")
        (n_ref, fmt, col_seq, col_beg, col_end, meta, skip, l_nm) = struct.unpack_from(
            "<8i", data, 4
        )
        p = 4 + 32
        names = data[p : p + l_nm].split(b"\x00")[:-1]
        names = [n.decode() for n in names]
        p += l_nm
        refs = []
        for _ in range(n_ref):
            r = RefIndex()
            (n_bin,) = struct.unpack_from("<i", data, p)
            p += 4
            for _ in range(n_bin):
                bin_, n_chunk = struct.unpack_from("<Ii", data, p)
                p += 8
                chunks = [
                    struct.unpack_from("<QQ", data, p + 16 * i)
                    for i in range(n_chunk)
                ]
                p += 16 * n_chunk
                if bin_ == PSEUDO_BIN and len(chunks) == 2:
                    (r.off_beg, r.off_end), (r.n_mapped, r.n_unmapped) = chunks
                else:
                    r.bins[bin_] = [(b, e) for b, e in chunks]
            (n_intv,) = struct.unpack_from("<i", data, p)
            p += 4
            if n_intv:
                r.linear = list(struct.unpack_from(f"<{n_intv}Q", data, p))
                p += 8 * n_intv
            refs.append(r)
        n_no_coor = (
            struct.unpack_from("<Q", data, p)[0] if p + 8 <= len(data) else None
        )
        return cls(names, refs, fmt, col_seq, col_beg, col_end, meta, skip, n_no_coor)

    def to_bytes(self) -> bytes:
        nm = b"".join(n.encode() + b"\x00" for n in self.names)
        out = bytearray()
        out += TBI_MAGIC
        out += struct.pack(
            "<8i", len(self.refs), self.fmt, self.col_seq, self.col_beg,
            self.col_end, self.meta, self.skip, len(nm),
        )
        out += nm
        for r in self.refs:
            has_pseudo = r.n_mapped >= 0 or r.n_unmapped >= 0
            out += struct.pack("<i", len(r.bins) + (1 if has_pseudo else 0))
            for bin_ in sorted(r.bins):
                chunks = r.bins[bin_]
                out += struct.pack("<Ii", bin_, len(chunks))
                for b, e in chunks:
                    out += struct.pack("<QQ", b, e)
            if has_pseudo:
                out += struct.pack("<Ii", PSEUDO_BIN, 2)
                out += struct.pack("<QQ", max(r.off_beg, 0), max(r.off_end, 0))
                out += struct.pack("<QQ", max(r.n_mapped, 0), max(r.n_unmapped, 0))
            out += struct.pack("<i", len(r.linear))
            if r.linear:
                out += struct.pack(f"<{len(r.linear)}Q", *r.linear)
        if self.n_no_coor is not None:
            out += struct.pack("<Q", self.n_no_coor)
        return bytes(out)

    # -- queries -----------------------------------------------------------

    def chunks_for(self, name: str, beg0: int, end0: int) -> list[tuple[int, int]]:
        try:
            rid = self.names.index(name)
        except ValueError:
            return []
        return ref_chunks(self.refs[rid], beg0, end0)

    def span_for_intervals(
        self, intervals: list[tuple[str, int, int]]
    ) -> list[tuple[int, int]]:
        """Union of chunk voffset spans over 1-based inclusive
        (contig, start, stop) intervals."""
        chunks: list[tuple[int, int]] = []
        for contig, start, stop in intervals:
            chunks.extend(self.chunks_for(contig, max(start - 1, 0), stop))
        return merge_chunks(chunks)


def read_tabix(path: str, open_fn=open) -> TabixIndex:
    with open_fn(path, "rb") as fh:
        reader = bgzf.BGZFReader(fh)
        data = bytearray()
        while True:
            chunk = reader.read(1 << 20)
            if not chunk:
                break
            data += chunk
    return TabixIndex.from_bytes(bytes(data))


def write_tabix(idx: TabixIndex, path: str, open_fn=open) -> None:
    with open_fn(path, "wb") as fh:
        w = bgzf.BGZFWriter(fh)
        w.write(idx.to_bytes())
        w.close()


def _iter_lines_with_voffsets(fh) -> Iterator[tuple[int, int, str]]:
    """(start_voffset, end_voffset, line) over a BGZF text stream."""
    pending = b""
    pending_voffset = 0
    last_block = (0, 0)
    for coffset, payload in bgzf.iter_blocks(fh, 0):
        if not payload:
            continue
        last_block = (coffset, len(payload))
        upto = 0
        while True:
            nl = payload.find(b"\n", upto)
            if nl < 0:
                if payload[upto:]:
                    if not pending:
                        pending_voffset = bgzf.make_voffset(coffset, upto)
                    pending += payload[upto:]
                break
            start_v = pending_voffset if pending else bgzf.make_voffset(coffset, upto)
            line = pending + payload[upto : nl + 1]
            yield (
                start_v,
                bgzf.make_voffset(coffset, nl + 1),
                line.decode("utf-8", "replace").rstrip("\r\n"),
            )
            pending = b""
            upto = nl + 1
    if pending:
        end_v = bgzf.make_voffset(*last_block)
        yield pending_voffset, end_v, pending.decode("utf-8", "replace").rstrip("\r\n")


def build_tabix(
    path: str,
    fmt: int = FMT_VCF,
    col_seq: int = 1,
    col_beg: int = 2,
    col_end: int = 0,
    meta: str = "#",
    open_fn=open,
) -> TabixIndex:
    """One pass over a BGZF-compressed tab-text file → TabixIndex (the
    offline analog of ``tabix -p vcf``). For VCF the end coordinate is
    ``pos + len(ref) - 1`` when no end column is configured."""
    names: list[str] = []
    name_ids: dict[str, int] = {}
    refs: list[RefIndex] = []
    with open_fn(path, "rb") as fh:
        for at, end_v, line in _iter_lines_with_voffsets(fh):
            if not line or (meta and line.startswith(meta)):
                continue
            cols = line.split("\t")
            seq = cols[col_seq - 1]
            beg = int(cols[col_beg - 1])
            if col_end:
                end = int(cols[col_end - 1])
                beg0, end0 = (beg, end) if fmt & FMT_ZERO_BASED else (beg - 1, end)
            elif fmt & ~FMT_ZERO_BASED == FMT_VCF:
                ref_allele = cols[3] if len(cols) > 3 else "N"
                beg0 = beg - 1
                end0 = beg0 + max(len(ref_allele), 1)
            else:
                beg0, end0 = beg - 1, beg
            rid = name_ids.get(seq)
            if rid is None:
                rid = name_ids[seq] = len(names)
                names.append(seq)
                refs.append(RefIndex(linear=[]))
            r = refs[rid]
            bin_ = reg2bin(beg0, end0)
            bl = r.bins.setdefault(bin_, [])
            if bl and (at <= bl[-1][1] or (at >> 16) <= (bl[-1][1] >> 16)):
                bl[-1] = (bl[-1][0], max(bl[-1][1], end_v))
            else:
                bl.append((at, end_v))
            if r.off_beg < 0:
                r.off_beg = at
            r.off_end = end_v
            r.n_mapped = max(r.n_mapped, 0) + 1
            first_win, last_win = beg0 >> LINEAR_SHIFT, max(end0 - 1, beg0) >> LINEAR_SHIFT
            if len(r.linear) <= last_win:
                r.linear.extend([0] * (last_win + 1 - len(r.linear)))
            for w in range(first_win, last_win + 1):
                if r.linear[w] == 0 or at < r.linear[w]:
                    r.linear[w] = at
    for r in refs:
        if r.off_beg >= 0:
            r.n_unmapped = max(r.n_unmapped, 0)
    return TabixIndex(names, refs, fmt, col_seq, col_beg, col_end, ord(meta), 0, 0)
