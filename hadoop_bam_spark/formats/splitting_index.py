"""Splitting index sidecar (``.sbi``-style) for BGZF record formats.

Semantics from the reference's splitting-bai (SplittingBAMIndex.java:41-90,
SplittingBAMIndexer.java:64-274, merge logic SAMFileMerger.java:105-149):
the virtual offset of every G-th record plus a terminating entry encoding
the file length, enabling O(1) split alignment (floor/ceiling lookup)
without any heuristic guessing. Our container format differs (magic +
explicit granularity header) but the lookup and merge semantics match.
"""

from __future__ import annotations

import bisect
import struct
from typing import BinaryIO

MAGIC = b"SBI\x01"
DEFAULT_GRANULARITY = 4096  # reference SplittingBAMIndexer.java:70


class SplittingIndex:
    """Sorted virtual offsets of every G-th record + file length sentinel."""

    def __init__(self, granularity: int, voffsets: list[int], file_length: int):
        self.granularity = granularity
        self.voffsets = voffsets
        self.file_length = file_length

    def next_record(self, file_offset: int) -> int | None:
        """First indexed record voffset at or after raw ``file_offset``
        (ceiling — reference SplittingBAMIndex.nextAlignment)."""
        i = bisect.bisect_left(self.voffsets, file_offset << 16)
        return self.voffsets[i] if i < len(self.voffsets) else None

    def prev_record(self, file_offset: int) -> int | None:
        """Last indexed record voffset at or before ``file_offset`` (floor)."""
        i = bisect.bisect_right(self.voffsets, file_offset << 16) - 1
        return self.voffsets[i] if i >= 0 else None

    def write(self, f: BinaryIO) -> None:
        f.write(MAGIC)
        f.write(struct.pack(">qq", self.granularity, len(self.voffsets)))
        for v in self.voffsets:
            f.write(struct.pack(">q", v))
        f.write(struct.pack(">q", self.file_length << 16))

    @classmethod
    def read(cls, f: BinaryIO) -> "SplittingIndex":
        if f.read(4) != MAGIC:
            raise ValueError("bad splitting-index magic")
        try:
            granularity, n = struct.unpack(">qq", f.read(16))
            payload = f.read()
            # validate the declared count against the actual bytes BEFORE
            # unpacking: a corrupt count field must be a data error, not a
            # struct.error (raise-don't-garbage; the declared size also
            # never drives an allocation)
            if n < 0 or len(payload) != 8 * (n + 1):
                raise ValueError(
                    f"corrupt splitting index: {n} entries declared, "
                    f"{len(payload)} payload bytes")
            vals = struct.unpack(f">{n + 1}q", payload)
        except struct.error as e:
            raise ValueError(f"truncated splitting index: {e}") from e
        return cls(granularity, list(vals[:-1]), vals[-1] >> 16)

    def write_reference_layout(self, f: BinaryIO) -> None:
        """Reference-compatible ``.splitting-bai``: a bare ascending sequence
        of big-endian i64 virtual offsets, terminated by fileLength<<16
        (SplittingBAMIndex.readIndex / SplittingBAMIndexer output,
        SplittingBAMIndex.java:53-73). Indexes we write this way are usable
        by Hadoop-BAM/htsjdk and vice versa."""
        for v in self.voffsets:
            f.write(struct.pack(">q", v))
        f.write(struct.pack(">q", self.file_length << 16))

    @classmethod
    def read_reference_layout(
        cls, f: BinaryIO, granularity: int = DEFAULT_GRANULARITY
    ) -> "SplittingIndex":
        """Read the reference's headerless big-endian-i64 layout. The layout
        carries no granularity; callers get the declared default (lookup
        semantics don't depend on it)."""
        data = f.read()
        if len(data) < 8 or len(data) % 8:
            raise ValueError("invalid splitting-bai: not a multiple of 8 bytes")
        vals = list(struct.unpack(f">{len(data) // 8}q", data))
        if any(a > b for a, b in zip(vals, vals[1:])):
            raise ValueError("invalid splitting-bai: offsets not in order")
        return cls(granularity, vals[:-1], vals[-1] >> 16)

    @classmethod
    def merge(
        cls,
        parts: list[tuple[list[int], int]],
        header_length: int,
        granularity: int = DEFAULT_GRANULARITY,
    ) -> "SplittingIndex":
        """Merge per-part index offsets into one file-level index by shifting
        each part's compressed offsets by the bytes written before it
        (reference SAMFileMerger.mergeSplittingBaiFiles offset arithmetic,
        SAMFileMerger.java:145-149).

        ``parts`` = [(voffsets_within_part, part_compressed_length), ...].
        """
        merged: list[int] = []
        base = header_length
        for voffsets, part_len in parts:
            for v in voffsets:
                merged.append(((v >> 16) + base) << 16 | (v & 0xFFFF))
            base += part_len
        return cls(granularity, merged, base)
