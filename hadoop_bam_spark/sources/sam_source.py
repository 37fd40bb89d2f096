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
    """Lines owned by the split: start byte in (start, end] — the Hadoop
    LineRecordReader convention. A non-first split always skips its leading
    (possibly partial) line, so the previous split reads one line past its
    end; a line starting exactly ON a boundary belongs to the EARLIER split.
    """
    with fs.open_file(partition.path, "rb") as fh:
        fh.seek(partition.start)
        if partition.start > 0:
            fh.readline()  # owned by the previous split
        while fh.tell() <= partition.end:
            line = fh.readline()
            if not line:
                return
            yield line.decode("utf-8", "replace").rstrip("\r\n")


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
        for line in iter_lines(partition):
            if not line or line.startswith("@"):
                continue
            buf.append(line)
            if len(buf) >= sam_vec.VEC_CHUNK_LINES:
                yield from self._chunk_batches(buf, target)
                buf = []
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
