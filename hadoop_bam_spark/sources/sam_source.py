"""``spark.read.format("sam")`` — splittable SAM text scan.

Line-boundary split realignment (skip the partial first line of non-first
splits) replaces the reference's header re-injection machinery
(SAMRecordReader.java:67-147,183-330) — with a typed schema there is no
header to re-inject, and '@' header lines are dropped at the scan
(SAMInputFormat.java:39-56 semantics).

Malformed lines: ``option("stringency", "strict"|"lenient"|"silent")``
(default strict), as in the reference's ValidationStringency readers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from hadoop_bam_spark import fs
from hadoop_bam_spark.formats.sam import SAM_SCHEMA, parse_sam_line
from hadoop_bam_spark.sources import list_format_files

DEFAULT_SPLIT_SIZE = 32 * 1024 * 1024


@dataclass
class TextRangePartition(InputPartition):
    path: str
    start: int
    end: int


def plan_text_splits(path: str, split_size: int, exts: tuple[str, ...]) -> list[TextRangePartition]:
    parts = []
    for f in list_format_files(path, *exts):
        size = fs.file_size(f)
        if size == 0:
            continue
        n = max(1, (size + split_size - 1) // split_size)
        step = (size + n - 1) // n
        parts.extend(
            TextRangePartition(f, i * step, min((i + 1) * step, size))
            for i in range(n)
        )
    return parts


def iter_lines(partition: TextRangePartition) -> Iterator[str]:
    """Lines owned by the split, one at a time (see iter_line_chunks for
    the ownership rule — this is its flattening wrapper)."""
    for chunk in iter_line_chunks(partition):
        yield from chunk


def iter_line_chunks(
    partition: TextRangePartition, chunk_bytes: int = 4 << 20
) -> Iterator[list]:
    """Lines owned by the split in BULK lists: one read + one split per
    ~4 MB window instead of a readline+decode per line (the text-scan hot
    path under the vectorized chunk parsers).

    Ownership is the Hadoop LineRecordReader convention, identical to the
    historical per-line reader: a line belongs to this split iff its first
    byte offset is <= end, and a non-first split always skips its leading
    (possibly partial) line, so the previous split reads one line past its
    end; a line starting exactly ON a boundary belongs to the EARLIER
    split. Byte windows never extend past end+1, so every complete line in
    a window starts at <= end; the straddling tail line is finished with
    one readline. UTF-8 is decoded per completed window (windows are cut
    at newline boundaries, which multi-byte sequences cannot span)."""
    with fs.open_file(partition.path, "rb") as fh:
        fh.seek(partition.start)
        if partition.start > 0:
            fh.readline()  # owned by the previous split
        pos = fh.tell()
        pending = b""
        while pos <= partition.end:
            data = fh.read(min(chunk_bytes, partition.end - pos + 1))
            if not data:
                break
            pos += len(data)
            blob = pending + data
            cut = blob.rfind(b"\n")
            if cut < 0:
                pending = blob
                continue
            pending = blob[cut + 1 :]
            seg = blob[:cut]
            lines = seg.decode("utf-8", "replace").split("\n")
            if b"\r" in seg:
                lines = [l.rstrip("\r") for l in lines]
            yield lines
        if pending:
            # tail line straddling end: owned (its start is <= end)
            rest = fh.readline()
            yield [(pending + rest).decode("utf-8", "replace").rstrip("\r\n")]


class SAMDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sam"

    def schema(self):
        from hadoop_bam_spark.sources import pruned_schema

        return pruned_schema(SAM_SCHEMA, self.options)[0]

    def reader(self, schema) -> "SAMReader":
        return SAMReader(self.options)


class SAMReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("sam source requires a path")
        self._split_size = int(options.get("split_size", DEFAULT_SPLIT_SIZE))
        self._path = path
        from hadoop_bam_spark.sources import pruned_schema, stringency_option

        self._stringency = stringency_option(options)
        self._schema, self._keep = pruned_schema(SAM_SCHEMA, options)
        self._wanted = (
            frozenset(SAM_SCHEMA.fields[i].name for i in self._keep)
            if self._keep is not None
            else None
        )

    def partitions(self):
        return plan_text_splits(self._path, self._split_size, (".sam",))

    def read(self, partition: TextRangePartition):
        """Chunked columnar decode (formats.sam_vec); chunks the vectorized
        parser rejects re-parse per-line with the scalar path, which applies
        ValidationStringency exactly as before."""
        from hadoop_bam_spark.formats import sam_vec
        from hadoop_bam_spark.sources import arrow_schema

        target = arrow_schema(self._schema)
        buf: list[str] = []
        size = sam_vec.VEC_CHUNK_LINES
        for chunk in iter_line_chunks(partition):
            buf.extend(l for l in chunk if l and not l.startswith("@"))
            while len(buf) >= size:
                yield from self._chunk_batches(buf[:size], target)
                buf = buf[size:]
        if buf:
            yield from self._chunk_batches(buf, target)

    def _chunk_batches(self, chunk, target):
        from hadoop_bam_spark.formats import sam_vec, vcf_vec

        arrays = sam_vec.parse_sam_chunk(chunk, self._wanted)
        if arrays:
            yield vcf_vec.chunk_to_batch(arrays, target)
            return
        from hadoop_bam_spark.sources import (
            apply_stringency,
            arrow_batches,
            project_rows,
        )

        rows = []
        for line in chunk:
            try:
                rows.append(parse_sam_line(line))
            except ValueError as e:
                apply_stringency(self._stringency, e, "sam")
        yield from arrow_batches(project_rows(iter(rows), self._keep), self._schema)
