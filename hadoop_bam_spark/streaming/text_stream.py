"""Shared machinery for streaming tabix-text tail sources.

``make_text_stream_source(name, schema, exts, parse_line)`` builds a
``spark.readStream.format(name)`` DataSource that tails a landing
directory for new files of the given extensions — the
continuously-delivered feed pattern (annotation drops, freshly-called
peaks, coverage-track updates) joined downstream against record
streams. Contract shared with ``vcf_stream``:

- offsets are the sorted processed-file list → exactly-once per file;
- ``option("intervals", ...)`` prunes WHOLE deliveries through a
  ``.tbi`` sidecar before any byte parses, with a per-row residual;
- ``option("stringency", ...)`` governs malformed rows exactly like the
  batch sources (STRICT raises — and keeps raising on restart, since
  the file is already in the offsets; LENIENT warns and skips; SILENT
  skips), so one bad row in a delivery cannot permanently wedge a
  lenient pipeline;
- a shard-sink output directory is tailed through its commit
  manifests, so half-committed batches are never consumed.

BED (``bed_stream``), bedGraph (``bedgraph_stream``) and GFF3/GTF
(``gff_stream``) bind this with their line parsers; the parser must
return None for header lines, and ``coords`` names the tuple indexes of
(contig, start_1based, end_1based) for the interval residual (default
(0, 1, 2); GFF passes (0, 3, 4)).
"""

from __future__ import annotations

import gzip
import os
from typing import Callable, Iterator, Optional, Sequence

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from hadoop_bam_spark.sources import local_path
from hadoop_bam_spark.streaming.lazyrows import LazyFileRows
from hadoop_bam_spark.streaming.vcf_stream import _tbi_says_empty


def _iter_text_rows(parse_line: Callable[[str], Optional[tuple]], fmt: str,
                    coords=(0, 1, 2)):
    ci, si, ei = coords

    def it(path: str, intervals=None, stringency: str = "strict") -> Iterator[tuple]:
        from hadoop_bam_spark.sources import apply_stringency

        if _tbi_says_empty(path, intervals):
            return
        with open(path, "rb") as probe:
            magic = probe.read(2)
        fh = (gzip.open(path, "rt", encoding="utf-8") if magic == b"\x1f\x8b"
              else open(path, "rt", encoding="utf-8"))
        with fh:
            for line in fh:
                try:
                    row = parse_line(line.rstrip("\r\n"))
                except ValueError as e:
                    # One malformed row must not permanently kill the
                    # query (the file is already in the offsets, so a
                    # strict failure would re-raise on every restart —
                    # that is strict's documented contract; lenient/
                    # silent skip and keep the stream alive).
                    apply_stringency(stringency, e, fmt)
                    continue
                if row is None:
                    continue
                if intervals is None or any(
                    c == row[ci] and row[si] <= stop and lo <= row[ei]
                    for c, lo, stop in intervals
                ):
                    yield row
    return it


class TextTailReader(SimpleDataSourceStreamReader):
    """Directory-tail reader parameterized by extensions + line parser."""

    def __init__(self, options, exts: Sequence[str], iter_rows, fmt: str):
        path = options.get("path")
        if not path:
            raise ValueError(f"{fmt} source requires a path (directory)")
        self._dir = local_path(path)
        self._exts = tuple(exts)
        self._iter_rows = iter_rows
        self._fmt = fmt
        from hadoop_bam_spark.sources import stringency_option

        self._stringency = stringency_option(options)
        self._intervals = None
        if options.get("intervals"):
            from hadoop_bam_spark.sources.bam_source import parse_intervals

            self._intervals = parse_intervals(options["intervals"])

    def _list(self) -> list:
        if not os.path.isdir(self._dir):
            return []
        from hadoop_bam_spark.streaming.shard_commit import committed_shards

        committed = committed_shards(self._dir, self._exts)
        if committed is not None:
            return sorted(
                n for n in committed
                if os.path.exists(os.path.join(self._dir, n))
            )
        return sorted(
            f for f in os.listdir(self._dir)
            if f.endswith(self._exts) and not f.startswith(".")
        )

    def initialOffset(self) -> dict:
        return {"processed": []}

    def read(self, start: dict):
        seen = set(start.get("processed", []))
        new = [f for f in self._list() if f not in seen]
        rows = LazyFileRows(
            [os.path.join(self._dir, n) for n in new],
            self._iter_rows,
            (self._intervals, self._stringency),
        )
        return rows, {"processed": sorted(seen | set(new))}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        seen = set(start.get("processed", []))
        for name in end.get("processed", []):
            if name in seen:
                continue
            full = os.path.join(self._dir, name)
            if not os.path.exists(full):
                raise FileNotFoundError(
                    f"{self._fmt} replay: {full} recorded in offsets but "
                    "missing on disk; restore the file (or reset the "
                    "checkpoint) to keep exactly-once semantics"
                )
            yield from self._iter_rows(full, self._intervals, self._stringency)

    def commit(self, end: dict) -> None:
        pass


def make_text_stream_source(name: str, schema, exts: Sequence[str],
                            parse_line, coords=(0, 1, 2)) -> type:
    """Build a DataSource class tailing ``exts`` files with ``parse_line``."""
    iter_rows = _iter_text_rows(parse_line, name, coords)

    class _TextStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:  # noqa: D102
            return name

        def schema(self):  # noqa: D102
            return schema

        def simpleStreamReader(self, schema) -> TextTailReader:
            return TextTailReader(self.options, exts, iter_rows, name)

    _TextStreamDataSource.__name__ = f"{name}_DataSource"
    return _TextStreamDataSource
