"""Standalone CRAM 3.0 structural validator.

Walks a CRAM file byte-by-byte and checks every container header field,
block frame, CRC32, compression-header map, slice header, and the EOF
container against the CRAM 3.0 specification — WITHOUT importing the
engine's reader (``formats/cram.py``) or any of its helpers. Everything
here, including the ITF8/LTF8 varint readers, is re-derived from the
published spec so that a systematic misreading in the engine's own
reader/writer pair cannot silently self-validate (the failure mode this
tool exists to close; the write path it audits mirrors the reference's
CRAMRecordWriter.java:74-121 -> htsjdk container writer).

Checks are deliberately STRUCTURAL: field ranges, cross-field
consistency (landmarks vs slice offsets, declared vs actual block ids,
record-counter chaining, container length vs bytes consumed), CRC32s,
per-method payload framing (gzip stream length, rANS-4x8 9-byte header
vs block sizes), and the byte-exact v3 EOF container. Record semantics
(CIGAR reconstruction etc.) are covered by decode tests elsewhere.

Usage::

    python -m hadoop_bam_spark.tools.cram3_validator file.cram [...]

exits non-zero and prints one line per finding if anything is wrong.
The library surface is :func:`validate_bytes` / :func:`validate_file`,
each returning a list of finding strings (empty == structurally valid).
"""

from __future__ import annotations

import gzip
import struct
import sys
import zlib

# --- spec constants (CRAM 3.0) ---------------------------------------------

MAGIC = b"CRAM"

# block compression methods (spec §8)
METHOD_RAW, METHOD_GZIP, METHOD_BZIP2, METHOD_LZMA, METHOD_RANS = range(5)

# block content types (spec §8.1)
CT_FILE_HEADER, CT_COMPRESSION_HEADER, CT_SLICE_HEADER = 0, 1, 2
CT_EXTERNAL, CT_CORE = 4, 5
_VALID_CTYPES = {0, 1, 2, 4, 5}

# encoding codec ids (spec §13)
CODEC_NULL, CODEC_EXTERNAL, CODEC_GOLOMB, CODEC_HUFFMAN = 0, 1, 2, 3
CODEC_BYTE_ARRAY_LEN, CODEC_BYTE_ARRAY_STOP = 4, 5
CODEC_BETA, CODEC_SUBEXP, CODEC_GOLOMB_RICE, CODEC_GAMMA = 6, 7, 8, 9

#: every data-series key named by the spec's §10.3 table (TC/TN are the
#: CRAM 1.0/2.0 legacy tag-count/name series some old writers emit)
KNOWN_SERIES = frozenset(
    "BF CF RI RL AP RG RN MF NS NP TS NF TL FN FC FP DL BA QS BS IN RS "
    "PD HC SC MQ BB QQ TC TN".split()
)

#: SAM/BAM tag value types legal in a tag-encoding-map key (spec §10.4 /
#: SAMtags): the packed key's low byte
TAG_TYPES = frozenset(b"AcCsSiIfZHB")

#: The fixed 38-byte v3 EOF container (spec §9). Derived field-by-field:
#:   container header: length=15 (int32 LE "0f000000"), ref_seq_id=-1
#:   (5-byte ITF8 "ffffffff0f"), start=4542278 ("EOF" in a 4-byte ITF8:
#:   "e0454f46"), span=0, n_records=0, counter=0 (LTF8 "00"), bases=0,
#:   n_blocks=1, n_landmarks=0, CRC32("...")="05bdd94f";
#:   then one raw block: method=0, type=1 (compression header), id=0,
#:   comp size=6, raw size=6, data = three empty maps, each encoded as
#:   size=1,count=0 -> "010001000100", block CRC32 = "ee63014b".
EOF_V3 = bytes.fromhex(
    "0f000000ffffffff0fe0454f4600000000010005bdd94f0001000606"
    "010001000100ee63014b"
)


class _Cursor:
    """Bounds-checked byte reader with spec ITF8/LTF8 (re-derived from
    CRAM 3.0 spec §2.3; intentionally NOT the engine's implementation)."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def remaining(self) -> int:
        return len(self.buf) - self.pos

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise EOFError(f"need {n} bytes at offset {self.pos}")
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def u8(self) -> int:
        return self.take(1)[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def itf8(self) -> int:
        """Unsigned ITF8: prefix bits of byte 0 give the byte count; the
        5-byte form keeps only the LOW 4 bits of the final byte."""
        b0 = self.u8()
        if b0 < 0x80:
            return b0
        if b0 < 0xC0:
            return ((b0 & 0x7F) << 8) | self.u8()
        if b0 < 0xE0:
            b = self.take(2)
            return ((b0 & 0x3F) << 16) | (b[0] << 8) | b[1]
        if b0 < 0xF0:
            b = self.take(3)
            return ((b0 & 0x1F) << 24) | (b[0] << 16) | (b[1] << 8) | b[2]
        b = self.take(4)
        return (
            ((b0 & 0x0F) << 28)
            | (b[0] << 20)
            | (b[1] << 12)
            | (b[2] << 4)
            | (b[3] & 0x0F)
        )

    def itf8_signed(self) -> int:
        v = self.itf8()
        return v - (1 << 32) if v > 0x7FFFFFFF else v

    def ltf8(self) -> int:
        """Signed LTF8: the number of leading 1-bits in byte 0 is the
        number of FOLLOWING bytes (0..8); 64-bit two's complement."""
        b0 = self.u8()
        n = 0
        while n < 8 and (b0 << n) & 0x80:
            n += 1
        if n == 0:
            v = b0
        elif n < 8:
            v = b0 & (0xFF >> (n + 1))
            for byte in self.take(n):
                v = (v << 8) | byte
        else:
            v = int.from_bytes(self.take(8), "big")
        return v - (1 << 64) if v >= (1 << 63) else v


def _parse_encoding(cur: _Cursor, findings: list, where: str,
                    ext_ids: set) -> None:
    """Parse one <codec id, params> encoding, recursing into
    BYTE_ARRAY_LEN's nested pair; collects EXTERNAL content ids and
    reports structural problems. ``where`` labels the finding."""
    codec = cur.itf8()
    plen = cur.itf8()
    if cur.remaining() < plen:
        findings.append(f"{where}: encoding params overrun block "
                        f"({plen} declared, {cur.remaining()} left)")
        cur.pos = len(cur.buf)
        return
    sub = _Cursor(cur.take(plen))
    try:
        if codec == CODEC_EXTERNAL:
            ext_ids.add(sub.itf8())
        elif codec == CODEC_BYTE_ARRAY_STOP:
            sub.u8()  # stop byte
            ext_ids.add(sub.itf8())
        elif codec == CODEC_BYTE_ARRAY_LEN:
            _parse_encoding(sub, findings, where + "/len", ext_ids)
            _parse_encoding(sub, findings, where + "/val", ext_ids)
        elif codec == CODEC_HUFFMAN:
            n = sub.itf8()
            for _ in range(n):
                sub.itf8()  # alphabet symbol
            m = sub.itf8()
            if m != n:
                findings.append(
                    f"{where}: huffman alphabet size {n} != bit-length "
                    f"array size {m}")
            for _ in range(m):
                sub.itf8()
        elif codec == CODEC_BETA:
            sub.itf8(); sub.itf8()  # offset, length
        elif codec == CODEC_SUBEXP:
            sub.itf8(); sub.itf8()  # offset, k
        elif codec in (CODEC_GOLOMB, CODEC_GOLOMB_RICE):
            sub.itf8(); sub.itf8()  # offset, m
        elif codec == CODEC_GAMMA:
            sub.itf8()  # offset
        elif codec == CODEC_NULL:
            pass
        else:
            findings.append(f"{where}: unknown codec id {codec}")
            return
    except EOFError as e:
        findings.append(f"{where}: truncated encoding params ({e})")
        return
    if sub.remaining():
        findings.append(
            f"{where}: {sub.remaining()} unconsumed encoding param bytes")


class _BlockInfo:
    __slots__ = ("method", "ctype", "cid", "data", "offset", "size")


def _parse_block(cur: _Cursor, findings: list, where: str,
                 decompress: bool = True):
    """One block frame (spec §8): method, type, ITF8 id/comp-size/raw-
    size, payload, CRC32 over everything before the CRC. Returns a
    _BlockInfo (data=None if the payload could not be validated) or None
    on truncation."""
    b = _BlockInfo()
    b.offset = cur.pos
    start = cur.pos
    try:
        b.method = cur.u8()
        b.ctype = cur.u8()
        b.cid = cur.itf8()
        csize = cur.itf8()
        rsize = cur.itf8()
        payload = cur.take(csize)
        stored_crc = cur.u32()
    except EOFError as e:
        findings.append(f"{where}: truncated block frame ({e})")
        return None
    b.size = cur.pos - start
    calc = zlib.crc32(cur.buf[start : cur.pos - 4]) & 0xFFFFFFFF
    if calc != stored_crc:
        findings.append(
            f"{where}: block CRC32 mismatch (stored {stored_crc:#010x}, "
            f"computed {calc:#010x})")
    if b.ctype not in _VALID_CTYPES:
        findings.append(f"{where}: invalid block content type {b.ctype}")
    b.data = None
    if b.method == METHOD_RAW:
        if csize != rsize:
            findings.append(
                f"{where}: raw block compressed size {csize} != raw size "
                f"{rsize}")
        b.data = payload
    elif b.method == METHOD_GZIP:
        try:
            b.data = gzip.decompress(payload)
        except (OSError, zlib.error, EOFError):
            # gzip.decompress surfaces header corruption as BadGzipFile
            # (an OSError) but MID-STREAM corruption as a raw zlib.error
            # and truncation as EOFError — all three are findings, not
            # crashes
            findings.append(f"{where}: gzip payload does not decompress")
        else:
            if len(b.data) != rsize:
                findings.append(
                    f"{where}: gzip raw size {len(b.data)} != declared "
                    f"{rsize}")
    elif b.method == METHOD_RANS:
        # rANS-4x8 framing (spec §13.6 / htslib rans_static): 1 order
        # byte (0|1), u32 LE compressed size of the REST of the stream,
        # u32 LE uncompressed size — checked against the block sizes
        # without running the codec (keeps this validator independent
        # of any entropy-decoder implementation).
        if csize < 9:
            findings.append(f"{where}: rANS payload shorter than its "
                            f"9-byte header ({csize})")
        else:
            order = payload[0]
            comp_sz, raw_sz = struct.unpack_from("<II", payload, 1)
            if order not in (0, 1):
                findings.append(f"{where}: rANS order byte {order} "
                                "not 0 or 1")
            if comp_sz != csize - 9:
                findings.append(
                    f"{where}: rANS header compressed size {comp_sz} != "
                    f"block payload size minus header {csize - 9}")
            if raw_sz != rsize:
                findings.append(
                    f"{where}: rANS header raw size {raw_sz} != block "
                    f"raw size {rsize}")
    elif b.method in (METHOD_BZIP2, METHOD_LZMA):
        if decompress:
            try:
                if b.method == METHOD_BZIP2:
                    import bz2

                    b.data = bz2.decompress(payload)
                else:
                    import lzma

                    b.data = lzma.decompress(payload)
            except Exception:
                findings.append(
                    f"{where}: method-{b.method} payload does not "
                    "decompress")
            else:
                if len(b.data) != rsize:
                    findings.append(
                        f"{where}: method-{b.method} raw size "
                        f"{len(b.data)} != declared {rsize}")
    else:
        findings.append(f"{where}: unknown compression method {b.method}")
    return b


def _parse_container_header(cur: _Cursor, findings: list, where: str):
    """-> dict of header fields, or None on truncation. Verifies the v3
    header CRC32 (over every header byte before the CRC field)."""
    start = cur.pos
    try:
        h = {
            "length": cur.i32(),
            "ref_seq_id": cur.itf8_signed(),
            "start": cur.itf8(),
            "span": cur.itf8(),
            "n_records": cur.itf8(),
            "record_counter": cur.ltf8(),
            "bases": cur.ltf8(),
            "n_blocks": cur.itf8(),
        }
        n_landmarks = cur.itf8()
        h["landmarks"] = [cur.itf8() for _ in range(n_landmarks)]
        crc_at = cur.pos
        stored = cur.u32()
    except EOFError as e:
        findings.append(f"{where}: truncated container header ({e})")
        return None
    calc = zlib.crc32(cur.buf[start:crc_at]) & 0xFFFFFFFF
    if calc != stored:
        findings.append(
            f"{where}: container header CRC32 mismatch (stored "
            f"{stored:#010x}, computed {calc:#010x})")
    if h["length"] < 0:
        findings.append(f"{where}: negative container length")
        return None
    return h


def _check_map_sizes(cur: _Cursor, findings: list, where: str):
    """Each compression-header map starts <size in bytes, n entries>;
    returns (n, sub-cursor over exactly `size` bytes) after verifying
    the declared size fits."""
    size = cur.itf8()
    if cur.remaining() < size:
        findings.append(
            f"{where}: declared map size {size} overruns block "
            f"({cur.remaining()} left)")
        cur.pos = len(cur.buf)
        return 0, _Cursor(b"")
    sub = _Cursor(cur.take(size))
    try:
        n = sub.itf8()
    except EOFError:
        findings.append(f"{where}: empty map body (no entry count)")
        return 0, sub
    return n, sub


def _parse_compression_header(data: bytes, findings: list, where: str):
    """EOFError-safe wrapper: corrupt map bytes that decompressed fine
    must surface as a finding, not a crash."""
    try:
        return _parse_compression_header_maps(data, findings, where)
    except EOFError as e:
        findings.append(f"{where}: truncated compression header ({e})")
        return set(), set()


def _parse_compression_header_maps(data: bytes, findings: list,
                                   where: str):
    """Validate the three maps; returns ``(ds_ids, tag_ids)`` — the
    external content ids referenced from the data-series map (every
    slice with records must provide these: the engine and htslib both
    emit them even when empty) and from the tag-encoding map (record-
    dependent: a slice none of whose records carry a given tag legally
    omits that tag's block, so absence is NOT a finding)."""
    cur = _Cursor(data)
    ext_ids: set = set()
    tag_ids: set = set()
    # --- preservation map (spec §10.6) ---
    n, sub = _check_map_sizes(cur, findings, where + "/preservation")
    for _ in range(n):
        try:
            key = sub.take(2).decode("latin-1")
        except EOFError:
            findings.append(f"{where}/preservation: truncated entry key")
            break
        if key in ("RN", "AP", "RR"):
            v = sub.u8()
            if v not in (0, 1):
                findings.append(
                    f"{where}/preservation: {key} boolean byte {v}")
        elif key == "SM":
            sm = sub.take(5)
            if len(sm) != 5:
                findings.append(f"{where}/preservation: SM not 5 bytes")
        elif key == "TD":
            ln = sub.itf8()
            td = sub.take(ln)
            if td and not td.endswith(b"\x00"):
                findings.append(
                    f"{where}/preservation: TD dictionary not NUL-"
                    "terminated")
            for line in td.split(b"\x00")[:-1]:
                if len(line) % 3:
                    findings.append(
                        f"{where}/preservation: TD line length "
                        f"{len(line)} not a multiple of 3")
                    break
                for i in range(2, len(line), 3):
                    if line[i] not in TAG_TYPES:
                        findings.append(
                            f"{where}/preservation: TD tag type "
                            f"{chr(line[i])!r} invalid")
        else:
            findings.append(
                f"{where}/preservation: unknown key {key!r} (cannot "
                "skip unknown-size value; rest of map unchecked)")
            break
    if sub.remaining():
        findings.append(
            f"{where}/preservation: {sub.remaining()} bytes beyond the "
            "declared entries")
    # --- data series encoding map (spec §10.3) ---
    n, sub = _check_map_sizes(cur, findings, where + "/data-series")
    for _ in range(n):
        try:
            key = sub.take(2).decode("latin-1")
        except EOFError:
            findings.append(f"{where}/data-series: truncated entry key")
            break
        if key not in KNOWN_SERIES:
            findings.append(
                f"{where}/data-series: unknown series key {key!r}")
        _parse_encoding(sub, findings, f"{where}/data-series[{key}]",
                        ext_ids)
    if sub.remaining():
        findings.append(
            f"{where}/data-series: {sub.remaining()} bytes beyond the "
            "declared entries")
    # --- tag encoding map (spec §10.4) ---
    n, sub = _check_map_sizes(cur, findings, where + "/tag-map")
    for _ in range(n):
        try:
            kv = sub.itf8()
        except EOFError:
            findings.append(f"{where}/tag-map: truncated packed key")
            break
        typ = kv & 0xFF
        tag = chr((kv >> 16) & 0xFF) + chr((kv >> 8) & 0xFF)
        if typ not in TAG_TYPES:
            findings.append(
                f"{where}/tag-map[{tag}]: value type {chr(typ)!r} "
                "invalid")
        _parse_encoding(sub, findings, f"{where}/tag-map[{tag}]",
                        tag_ids)
    if sub.remaining():
        findings.append(
            f"{where}/tag-map: {sub.remaining()} bytes beyond the "
            "declared entries")
    if cur.remaining():
        findings.append(
            f"{where}: {cur.remaining()} bytes after the tag encoding "
            "map")
    return ext_ids, tag_ids


def _parse_slice(body_cur: _Cursor, findings: list, where: str,
                 container, needed_ids: set, expected_counter):
    """Slice-header block + its n_blocks data blocks. Returns
    (n_records, counter, blocks_consumed) or None."""
    sh_block = _parse_block(body_cur, findings, where + "/slice-header")
    if sh_block is None:
        return None
    if sh_block.ctype != CT_SLICE_HEADER:
        findings.append(
            f"{where}: landmark does not point at a slice-header block "
            f"(content type {sh_block.ctype})")
        return None
    if sh_block.data is None:
        return None
    sc = _Cursor(sh_block.data)
    try:
        ref = sc.itf8_signed()
        start = sc.itf8()
        span = sc.itf8()
        nrec = sc.itf8()
        counter = sc.ltf8()
        nblocks = sc.itf8()
        nids = sc.itf8()
        ids = [sc.itf8() for _ in range(nids)]
        embed = sc.itf8_signed()
        md5 = sc.take(16)
    except EOFError as e:
        findings.append(f"{where}: truncated slice header ({e})")
        return None
    del md5  # all-zero == "not known": any value is legal
    if sc.remaining():
        findings.append(
            f"{where}: {sc.remaining()} unconsumed slice-header bytes")
    if ref == -2:
        if start != 0 or span != 0:
            findings.append(
                f"{where}: multi-ref slice must carry start=0 span=0 "
                f"(got {start}/{span})")
    elif ref == -1:
        if start != 0 or span != 0:
            findings.append(
                f"{where}: unmapped slice must carry start=0 span=0 "
                f"(got {start}/{span})")
    elif ref < -2:
        findings.append(f"{where}: invalid slice ref_seq_id {ref}")
    if expected_counter is not None and counter != expected_counter:
        findings.append(
            f"{where}: slice record counter {counter} breaks the chain "
            f"(expected {expected_counter})")
    if embed != -1 and embed not in ids:
        findings.append(
            f"{where}: embedded-ref block id {embed} not among the "
            f"slice's content ids {ids}")
    # --- the slice's blocks: core (type 5) + externals matching ids ---
    seen_ids = []
    n_core = 0
    for j in range(nblocks):
        blk = _parse_block(body_cur, findings, f"{where}/block[{j}]")
        if blk is None:
            return None
        if blk.ctype == CT_CORE:
            n_core += 1
        elif blk.ctype == CT_EXTERNAL:
            seen_ids.append(blk.cid)
        else:
            findings.append(
                f"{where}/block[{j}]: content type {blk.ctype} inside "
                "a slice (only core/external allowed)")
    if n_core != 1:
        findings.append(
            f"{where}: {n_core} core blocks (spec requires exactly 1)")
    if sorted(seen_ids) != sorted(ids):
        # multiset compare: the spec requires the declared blocks to be
        # PRESENT, not in declaration order — third-party writers may
        # legally reorder externals within the slice
        findings.append(
            f"{where}: external block ids {sorted(seen_ids)} != slice "
            f"header declaration {sorted(ids)}")
    if nrec > 0:
        # only data-series ids are unconditionally required; tag-map
        # ids are record-dependent (a slice whose records carry no such
        # tag legally omits the block — htslib and this engine both do)
        missing = needed_ids[0] - set(ids)
        if missing:
            findings.append(
                f"{where}: data-series encodings reference external ids "
                f"{sorted(missing)} the slice does not provide")
    return nrec, counter, 1 + nblocks


def validate_bytes(buf: bytes, max_findings: int = 200) -> list[str]:
    """Validate a whole CRAM 3.0 byte stream; returns finding strings
    (empty list == structurally valid)."""
    findings: list[str] = []
    cur = _Cursor(buf)
    # --- file definition (spec §6): magic, version, 20-byte file id ---
    try:
        magic = cur.take(4)
        major, minor = cur.u8(), cur.u8()
        cur.take(20)
    except EOFError:
        return ["file shorter than the 26-byte file definition"]
    if magic != MAGIC:
        return [f"bad magic {magic!r} (want b'CRAM')"]
    if major != 3:
        return [f"not CRAM 3.x (major={major}); this validator checks "
                "the 3.0 container layout"]
    if minor != 0:
        findings.append(f"minor version {minor} (validator targets 3.0)")
    # --- containers -----------------------------------------------------
    container_no = 0
    expected_counter = None  # chained across containers once known
    saw_eof = False
    while cur.remaining():
        where = f"container[{container_no}] @0x{cur.pos:x}"
        at = cur.pos
        if cur.remaining() == len(EOF_V3) and buf.endswith(EOF_V3):
            saw_eof = True
            cur.pos = len(buf)
            break
        h = _parse_container_header(cur, findings, where)
        if h is None:
            break
        body_start = cur.pos
        if cur.remaining() < h["length"]:
            findings.append(
                f"{where}: container length {h['length']} overruns the "
                f"file ({cur.remaining()} bytes left)")
            break
        body_end = body_start + h["length"]
        body_cur = _Cursor(buf[:body_end], body_start)

        if container_no == 0:
            # SAM-header container (spec §7): one file-header block
            blk = _parse_block(body_cur, findings, where + "/file-header")
            if blk is not None:
                if blk.ctype != CT_FILE_HEADER:
                    findings.append(
                        f"{where}: first container block has content "
                        f"type {blk.ctype}, not 0 (file header)")
                elif blk.data is not None:
                    if len(blk.data) < 4:
                        findings.append(
                            f"{where}: file-header payload shorter than "
                            "its own length prefix")
                    else:
                        (tlen,) = struct.unpack_from("<i", blk.data, 0)
                        if tlen < 0 or 4 + tlen > len(blk.data):
                            findings.append(
                                f"{where}: SAM text length {tlen} "
                                "exceeds the block payload")
            # htsjdk pads the header container for in-place rewrite;
            # trailing bytes after the block are tolerated by readers —
            # only flag if the block itself overran
            n_blocks_found = 1 if blk is not None else 0
            if h["n_blocks"] != n_blocks_found:
                findings.append(
                    f"{where}: header n_blocks {h['n_blocks']} != "
                    f"{n_blocks_found} parsed")
        else:
            # --- data container ------------------------------------------
            comp_block = _parse_block(
                body_cur, findings, where + "/compression-header")
            if comp_block is None:
                cur.pos = body_end
                container_no += 1
                continue
            if comp_block.ctype != CT_COMPRESSION_HEADER:
                findings.append(
                    f"{where}: first block content type "
                    f"{comp_block.ctype}, not 1 (compression header)")
            needed_ids: tuple = (set(), set())
            if comp_block.data is not None:
                needed_ids = _parse_compression_header(
                    comp_block.data, findings,
                    where + "/compression-header")
            # landmarks: i-th slice-header block offset within the body
            if h["landmarks"] and h["landmarks"][0] != comp_block.size:
                findings.append(
                    f"{where}: first landmark {h['landmarks'][0]} != "
                    f"compression-header block size {comp_block.size}")
            if h["record_counter"] is not None and expected_counter is \
                    not None and h["record_counter"] != expected_counter \
                    and h["record_counter"] != 0:
                # a reset to 0 is the merged-shard shape: distributed
                # writers (reference SAMFileMerger.java:92-103 merging
                # htsjdk task outputs; this engine's sharded sink) each
                # start their counter at 0, and the merge concatenates
                # containers verbatim — the chain restarts per shard.
                # Corrupted counter BYTES are still caught by the
                # container-header CRC32.
                findings.append(
                    f"{where}: container record counter "
                    f"{h['record_counter']} breaks the chain (expected "
                    f"{expected_counter})")
            slice_counter = h["record_counter"]
            total_rec = 0
            total_blocks = 1  # compression header
            for si, lm in enumerate(h["landmarks"]):
                slice_off = body_start + lm
                if body_cur.pos != slice_off:
                    findings.append(
                        f"{where}/slice[{si}]: landmark {lm} does not "
                        f"match the byte walk (at {body_cur.pos - body_start})")
                    body_cur.pos = slice_off  # resync and keep checking
                res = _parse_slice(
                    body_cur, findings, f"{where}/slice[{si}]", h,
                    needed_ids, slice_counter)
                if res is None:
                    break
                nrec, _counter, nblk = res
                total_rec += nrec
                total_blocks += nblk
                if slice_counter is not None:
                    slice_counter += nrec
            else:
                if total_rec != h["n_records"]:
                    findings.append(
                        f"{where}: slices hold {total_rec} records, "
                        f"header says {h['n_records']}")
                if total_blocks != h["n_blocks"]:
                    findings.append(
                        f"{where}: counted {total_blocks} blocks, "
                        f"header says {h['n_blocks']}")
                if body_cur.pos != body_end:
                    findings.append(
                        f"{where}: container length {h['length']} but "
                        f"blocks end at {body_cur.pos - body_start}")
                expected_counter = slice_counter
        cur.pos = body_end
        container_no += 1
        if len(findings) >= max_findings:
            findings.append("... (finding limit reached)")
            return findings
    if not saw_eof:
        findings.append(
            "file does not end with the fixed 38-byte v3 EOF container")
    return findings


def validate_file(path: str) -> list[str]:
    with open(path, "rb") as fh:
        return validate_bytes(fh.read())


def main(argv: list[str]) -> int:
    if not argv:
        print("usage: cram3_validator FILE.cram [FILE.cram ...]",
              file=sys.stderr)
        return 2
    bad = 0
    for path in argv:
        findings = validate_file(path)
        for f in findings:
            print(f"{path}: {f}")
        if findings:
            bad += 1
        else:
            print(f"{path}: OK")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
