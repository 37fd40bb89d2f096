"""Streaming BED ingest: ``spark.readStream.format("bed_stream")``.

Tails a landing directory for new ``.bed`` / ``.bed.gz`` / ``.bed.bgz``
files — the continuously-delivered annotation/feature-feed pattern
(region blocklists, freshly-called peaks) joined downstream against
read or variant streams. Same contract as ``vcf_stream``: offsets are
the sorted processed-file list (exactly-once per file), interval
options prune whole deliveries via a ``.tbi`` sidecar before any byte
parses, and a shard-sink output directory is tailed through its
commit manifests.
"""

from __future__ import annotations

import gzip
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from hadoop_bam_spark.formats.bed import BED_SCHEMA, parse_bed_line
from hadoop_bam_spark.sources import local_path
from hadoop_bam_spark.streaming.lazyrows import LazyFileRows
from hadoop_bam_spark.streaming.vcf_stream import _tbi_says_empty

_EXTS = (".bed", ".bed.gz", ".bed.bgz")


def _iter_bed_rows(path: str, intervals=None) -> Iterator[tuple]:
    if _tbi_says_empty(path, intervals):
        return
    with open(path, "rb") as probe:
        magic = probe.read(2)
    fh = (gzip.open(path, "rt", encoding="utf-8") if magic == b"\x1f\x8b"
          else open(path, "rt", encoding="utf-8"))
    with fh:
        for line in fh:
            row = parse_bed_line(line.rstrip("\r\n"))
            if row is None:
                continue
            if intervals is None or any(
                c == row[0] and row[1] <= stop and lo <= row[2]
                for c, lo, stop in intervals
            ):
                yield row


class BEDStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bed_stream"

    def schema(self):
        return BED_SCHEMA

    def simpleStreamReader(self, schema) -> "BEDStreamReader":
        return BEDStreamReader(self.options)


class BEDStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("bed_stream source requires a path (directory)")
        self._dir = local_path(path)
        self._intervals = None
        if options.get("intervals"):
            from hadoop_bam_spark.sources.bam_source import parse_intervals

            self._intervals = parse_intervals(options["intervals"])

    def _list(self) -> list[str]:
        if not os.path.isdir(self._dir):
            return []
        from hadoop_bam_spark.streaming.shard_commit import committed_shards

        committed = committed_shards(self._dir, _EXTS)
        if committed is not None:
            return sorted(
                n for n in committed
                if os.path.exists(os.path.join(self._dir, n))
            )
        return sorted(
            f for f in os.listdir(self._dir)
            if f.endswith(_EXTS) and not f.startswith(".")
        )

    def initialOffset(self) -> dict:
        return {"processed": []}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        seen = set(start.get("processed", []))
        new = [f for f in self._list() if f not in seen]
        rows = LazyFileRows(
            [os.path.join(self._dir, n) for n in new],
            _iter_bed_rows,
            (self._intervals,),
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
                    f"bed_stream replay: {full} recorded in offsets but "
                    "missing on disk; restore the file (or reset the "
                    "checkpoint) to keep exactly-once semantics"
                )
            yield from _iter_bed_rows(full, self._intervals)

    def commit(self, end: dict) -> None:
        pass
