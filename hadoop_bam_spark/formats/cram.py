"""Pure-Python CRAM codec (read 2.x/3.0, write 3.0).

The reference treats CRAM as a first-class SAM-family format
(CRAMInputFormat.java:31-80 plans splits on container boundaries;
CRAMRecordReader.java:33-56 decodes a container range;
CRAMRecordWriter.java:74-121 writes bare containers merged behind a header
+ EOF container, util/SAMFileMerger.java:92-103). It delegates the codec
itself to htsjdk; here the codec is implemented directly from the public
CRAM 2.1/3.0 specification (samtools/hts-specs CRAMv3.pdf):

- file definition, ITF8/LTF8 varints, container/block framing (v2 without
  / v3 with CRC32 trailers), gzip/bzip2/lzma/rANS-4x8 block codecs
- compression header: preservation map (RN/AP/RR/SM/TD), data-series
  encoding map, tag encoding map
- encodings: EXTERNAL, HUFFMAN (canonical, MSB-first), BETA, GAMMA,
  SUBEXP, BYTE_ARRAY_LEN, BYTE_ARRAY_STOP over a core bit stream +
  external byte streams
- record decode: bam/compression flags, positions, detached/downstream
  mates, tag lines, feature-based cigar/sequence reconstruction
  (with reference FASTA, substitution matrix) and verbatim-bases records

The writer emits a conservative, spec-valid 3.0 subset: multiref slices,
absolute positions, detached mates, every data series in its own
gzip-compressed EXTERNAL block, sequences stored verbatim ('b'/BA
features, no reference required: RR=false) — the same shape htslib
produces under ``no_ref``, so files round-trip without a FASTA at hand.
"""

from __future__ import annotations

import gzip
import struct
import zlib
from dataclasses import dataclass, field
from typing import BinaryIO, Iterator, Optional

CRAM_MAGIC = b"CRAM"

#: Fixed v3 EOF container (CRAM 3.0 spec §9; byte-for-byte).
EOF_CONTAINER_V3 = bytes.fromhex(
    "0f000000ffffffff0fe0454f4600000000010005bdd94f0001000606"
    "01000100010000ee63014b"
)
#: v2.1 EOF container (htslib check_EOF; no CRCs).
EOF_CONTAINER_V2 = bytes.fromhex(
    "0b000000ffffffff0fe0454f4600000000010005bdd94f000100000000"
)

# block content types (spec §8)
CT_FILE_HEADER = 0
CT_COMPRESSION_HEADER = 1
CT_SLICE_HEADER = 2
CT_EXTERNAL = 4
CT_CORE = 5

# block compression methods
M_RAW, M_GZIP, M_BZIP2, M_LZMA, M_RANS = 0, 1, 2, 3, 4


# ---------------------------------------------------------------------------
# ITF8 / LTF8 varints
# ---------------------------------------------------------------------------

def read_itf8(data, p: int) -> tuple[int, int]:
    b1 = data[p]
    if b1 < 0x80:
        return b1, p + 1
    if b1 < 0xC0:
        return ((b1 & 0x7F) << 8) | data[p + 1], p + 2
    if b1 < 0xE0:
        return ((b1 & 0x3F) << 16) | (data[p + 1] << 8) | data[p + 2], p + 3
    if b1 < 0xF0:
        return (
            ((b1 & 0x1F) << 24)
            | (data[p + 1] << 16)
            | (data[p + 2] << 8)
            | data[p + 3],
            p + 4,
        )
    return (
        ((b1 & 0x0F) << 28)
        | (data[p + 1] << 20)
        | (data[p + 2] << 12)
        | (data[p + 3] << 4)
        | (data[p + 4] & 0x0F),
        p + 5,
    )


def read_itf8_signed(data, p: int) -> tuple[int, int]:
    v, p = read_itf8(data, p)
    if v > 0x7FFFFFFF:
        v -= 1 << 32
    return v, p


def write_itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes(
            [0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF]
        )
    return bytes(
        [
            0xF0 | (v >> 28),
            (v >> 20) & 0xFF,
            (v >> 12) & 0xFF,
            (v >> 4) & 0xFF,
            v & 0x0F,
        ]
    )


def read_ltf8(data, p: int) -> tuple[int, int]:
    b1 = data[p]
    n = 0
    mask = 0x80
    while n < 8 and b1 & mask:
        n += 1
        mask >>= 1
    if n == 0:
        return b1, p + 1
    if n < 8:
        v = b1 & (0xFF >> (n + 1))
    else:
        v = 0
    for i in range(n):
        v = (v << 8) | data[p + 1 + i]
    if v > 0x7FFFFFFFFFFFFFFF:
        v -= 1 << 64
    return v, p + 1 + n


def write_ltf8(v: int) -> bytes:
    v &= 0xFFFFFFFFFFFFFFFF
    if v < 0x80:
        return bytes([v])
    out = []
    n = 0
    x = v
    while True:
        n += 1
        x >>= 8
        # n bytes following can hold v if v < 2^(8n + (7-n)) for n<8
        if n == 8 or v < (1 << (8 * n + (7 - n))):
            break
    if n == 8:
        return bytes([0xFF]) + v.to_bytes(8, "big")
    first = (0xFF << (8 - n)) & 0xFF | (v >> (8 * n))
    return bytes([first]) + v.to_bytes(n + 1, "big")[1:]


# ---------------------------------------------------------------------------
# rANS 4x8 decode (CRAM 3.0 spec §13; htslib rans_static layout)
# ---------------------------------------------------------------------------

_RANS_TF_SHIFT = 12
_RANS_TOTFREQ = 1 << _RANS_TF_SHIFT
_RANS_LOW = 1 << 23


def _rans_read_freqs(data, p):
    """Order-0 frequency table -> (freq[256], cum[256], lookup[4096], p)."""
    freq = [0] * 256
    sym = data[p]
    p += 1
    last = sym
    rle = 0
    while True:
        f = data[p]
        p += 1
        if f >= 128:
            f = ((f & 127) << 8) | data[p]
            p += 1
        freq[sym] = f
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            last = sym
            sym = data[p]
            p += 1
            if sym == last + 1:
                rle = data[p]
                p += 1
        if sym == 0:
            break
    cum = [0] * 257
    for i in range(256):
        cum[i + 1] = cum[i] + freq[i]
    lookup = bytearray(_RANS_TOTFREQ)
    for i in range(256):
        if freq[i]:
            lookup[cum[i] : cum[i + 1]] = bytes([i]) * freq[i]
    return freq, cum, bytes(lookup), p


def rans_decode(data: bytes, raw_size: int) -> bytes:
    order = data[0]
    # compressed size u32, raw size u32 (little-endian)
    (n_out,) = struct.unpack_from("<I", data, 5)
    if raw_size is not None and n_out != raw_size:
        raise ValueError(
            f"rANS raw size mismatch: block header says {raw_size}, "
            f"stream embeds {n_out}"
        )
    try:
        return _rans_decode_body(data, order, n_out)
    except IndexError:
        raise ValueError("truncated rANS block") from None


def _rans_decode_body(data: bytes, order: int, n_out: int) -> bytes:
    p = 9
    out = bytearray(n_out)
    if order == 0:
        freq, cum, lookup, p = _rans_read_freqs(data, p)
        states = list(struct.unpack_from("<4I", data, p))
        p += 16
        for i in range(n_out):
            s = states[i & 3]
            f = s & (_RANS_TOTFREQ - 1)
            sym = lookup[f]
            out[i] = sym
            s = freq[sym] * (s >> _RANS_TF_SHIFT) + f - cum[sym]
            while s < _RANS_LOW:
                s = (s << 8) | data[p]
                p += 1
            states[i & 3] = s
    elif order == 1:
        # per-context tables, contexts RLE-compressed the same way
        freqs = [None] * 256
        ctx = data[p]
        p += 1
        last_ctx = ctx
        rle = 0
        while True:
            f, c, lk, p = _rans_read_freqs(data, p)
            freqs[ctx] = (f, c, lk)
            if rle > 0:
                rle -= 1
                ctx += 1
            else:
                last_ctx = ctx
                ctx = data[p]
                p += 1
                if ctx == last_ctx + 1:
                    rle = data[p]
                    p += 1
            if ctx == 0:
                break
        states = list(struct.unpack_from("<4I", data, p))
        p += 16
        q = n_out >> 2
        ptrs = [0, q, 2 * q, 3 * q]
        ctxs = [0, 0, 0, 0]
        for i in range(q):
            for j in range(4):
                f_, c_, lk_ = freqs[ctxs[j]] or freqs[0]
                s = states[j]
                f = s & (_RANS_TOTFREQ - 1)
                sym = lk_[f]
                out[ptrs[j]] = sym
                ptrs[j] += 1
                s = f_[sym] * (s >> _RANS_TF_SHIFT) + f - c_[sym]
                while s < _RANS_LOW:
                    s = (s << 8) | data[p]
                    p += 1
                states[j] = s
                ctxs[j] = sym
        # remainder handled by the 4th state
        i = 4 * q
        s = states[3]
        c3 = ctxs[3]
        while i < n_out:
            f_, c_, lk_ = freqs[c3] or freqs[0]
            f = s & (_RANS_TOTFREQ - 1)
            sym = lk_[f]
            out[i] = sym
            i += 1
            s = f_[sym] * (s >> _RANS_TF_SHIFT) + f - c_[sym]
            # renormalize only while input remains: the final symbols of a
            # well-formed stream leave the state below LOW with no bytes left
            while s < _RANS_LOW and p < len(data):
                s = (s << 8) | data[p]
                p += 1
            c3 = sym
    else:
        raise ValueError(f"unsupported rANS order {order}")
    return bytes(out)


# ---------------------------------------------------------------------------
# Blocks and containers
# ---------------------------------------------------------------------------

@dataclass
class Block:
    method: int
    content_type: int
    content_id: int
    data: bytes  # uncompressed

    @classmethod
    def parse(cls, buf, p: int, major: int) -> tuple["Block", int]:
        method = buf[p]
        ctype = buf[p + 1]
        p += 2
        content_id, p = read_itf8(buf, p)
        csize, p = read_itf8(buf, p)
        rsize, p = read_itf8(buf, p)
        raw = bytes(buf[p : p + csize])
        p += csize
        if major >= 3:
            p += 4  # CRC32
        if method == M_RAW:
            data = raw
        elif method == M_GZIP:
            data = gzip.decompress(raw)
        elif method == M_BZIP2:
            import bz2

            data = bz2.decompress(raw)
        elif method == M_LZMA:
            import lzma

            data = lzma.decompress(raw)
        elif method == M_RANS:
            data = rans_decode(raw, rsize)
        else:
            raise ValueError(f"unsupported block method {method}")
        return cls(method, ctype, content_id, data), p

    def serialize(self, major: int, level: int = 6) -> bytes:
        if self.method == M_GZIP:
            raw = gzip.compress(self.data, level)
        elif self.method == M_RAW:
            raw = self.data
        else:
            raise ValueError("writer supports raw/gzip blocks only")
        out = bytearray([self.method, self.content_type])
        out += write_itf8(self.content_id)
        out += write_itf8(len(raw))
        out += write_itf8(len(self.data))
        out += raw
        if major >= 3:
            out += struct.pack("<I", zlib.crc32(bytes(out)))
        return bytes(out)


@dataclass
class ContainerHeader:
    length: int  # byte length of the container body (after the header)
    ref_seq_id: int
    start: int
    span: int
    n_records: int
    record_counter: int
    n_bases: int
    n_blocks: int
    landmarks: list[int]
    header_size: int  # bytes consumed by this header

    @classmethod
    def parse(cls, buf, p: int, major: int) -> "ContainerHeader":
        p0 = p
        (length,) = struct.unpack_from("<i", buf, p)
        p += 4
        ref_seq_id, p = read_itf8_signed(buf, p)
        start, p = read_itf8(buf, p)
        span, p = read_itf8(buf, p)
        n_records, p = read_itf8(buf, p)
        record_counter, p = read_ltf8(buf, p)
        n_bases, p = read_ltf8(buf, p)
        n_blocks, p = read_itf8(buf, p)
        n_landmarks, p = read_itf8(buf, p)
        landmarks = []
        for _ in range(n_landmarks):
            lm, p = read_itf8(buf, p)
            landmarks.append(lm)
        if major >= 3:
            p += 4  # CRC32
        return cls(
            length, ref_seq_id, start, span, n_records, record_counter,
            n_bases, n_blocks, landmarks, p - p0,
        )

    def serialize(self, major: int) -> bytes:
        out = bytearray(struct.pack("<i", self.length))
        out += write_itf8(self.ref_seq_id)
        out += write_itf8(self.start)
        out += write_itf8(self.span)
        out += write_itf8(self.n_records)
        out += write_ltf8(self.record_counter)
        out += write_ltf8(self.n_bases)
        out += write_itf8(self.n_blocks)
        out += write_itf8(len(self.landmarks))
        for lm in self.landmarks:
            out += write_itf8(lm)
        if major >= 3:
            out += struct.pack("<I", zlib.crc32(bytes(out)))
        return bytes(out)


def read_file_definition(fh: BinaryIO) -> tuple[int, int]:
    """-> (major, minor); consumes the 26-byte file definition."""
    magic = fh.read(4)
    if magic != CRAM_MAGIC:
        raise ValueError("not a CRAM file (bad magic)")
    major, minor = fh.read(1)[0], fh.read(1)[0]
    fh.read(20)  # file id
    return major, minor


def read_sam_header_text(fh: BinaryIO, major: int) -> tuple[str, int]:
    """Read the SAM header container (must follow the file definition).
    Returns (header_text, offset_after_container)."""
    start = fh.tell()
    head = fh.read(64)
    hdr = ContainerHeader.parse(head, 0, major)
    fh.seek(start + hdr.header_size)
    body = fh.read(hdr.length)
    block, _ = Block.parse(body, 0, major)
    (text_len,) = struct.unpack_from("<i", block.data, 0)
    text = block.data[4 : 4 + text_len].decode("utf-8", "replace")
    return text.rstrip("\x00"), start + hdr.header_size + hdr.length


def iter_container_offsets(path: str, open_fn=open) -> Iterator[tuple[int, "ContainerHeader"]]:
    """(file_offset, header) for every container after the SAM header one.
    Stops at the EOF container (ref_seq_id==-1 with 0 records) or EOF.
    Reads only container headers — this is the split-planning scan
    (reference CRAMInputFormat.getSplits walks container boundaries,
    CRAMInputFormat.java:31-80)."""
    with open_fn(path, "rb") as fh:
        major, _ = read_file_definition(fh)
        _, pos = read_sam_header_text(fh, major)
        import os

        size = os.fstat(fh.fileno()).st_size if hasattr(fh, "fileno") else None
        while True:
            fh.seek(pos)
            head = fh.read(64)
            if len(head) < 8:
                return
            hdr = ContainerHeader.parse(head, 0, major)
            if hdr.ref_seq_id == -1 and hdr.n_records == 0 and hdr.start in (0, 0x454F46):
                return  # EOF container
            yield pos, hdr
            pos += hdr.header_size + hdr.length
            if size is not None and pos >= size:
                return
