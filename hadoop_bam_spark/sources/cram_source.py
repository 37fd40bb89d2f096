"""``spark.read.format("cram")`` — splittable parallel CRAM scan.

Split planning walks container headers on the driver (header-only reads)
and aligns byte-range splits to container boundaries — the Spark-native
equivalent of the reference's ``CRAMInputFormat.getSplits``
(CRAMInputFormat.java:31-80: each split is [first container at-or-after
start, first container at-or-after end)). Executors decode whole containers
in their range with the pure-Python codec (formats/cram.py) — the
reference delegates this to htsjdk (CRAMRecordReader.java:33-56); no JVM
sidecar is needed here.

Options:
  path         file or directory of .cram files
  split_size   target compressed bytes per partition (default 32 MiB)
  reference    FASTA path (with optional .fai) for reference-compressed
               files (RR=true); files our sink writes need none (RR=false)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from hadoop_bam_spark import fs
from hadoop_bam_spark.formats import cram
from hadoop_bam_spark.formats.sam import SAM_SCHEMA
from hadoop_bam_spark.sources import list_format_files

DEFAULT_SPLIT_SIZE = 32 * 1024 * 1024


@dataclass
class CRAMPartition(InputPartition):
    path: str
    start: int  # container-boundary byte offset
    end: int    # exclusive; containers starting in [start, end) belong here


class CRAMDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cram"

    def schema(self):
        from hadoop_bam_spark.sources import pruned_schema

        return pruned_schema(SAM_SCHEMA, self.options)[0]

    def reader(self, schema) -> "CRAMReader":
        return CRAMReader(self.options)


class CRAMReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("cram source requires a path")
        from hadoop_bam_spark.sources import pruned_schema

        self._schema, self._keep = pruned_schema(SAM_SCHEMA, options)
        self._split_size = int(options.get("split_size", DEFAULT_SPLIT_SIZE))
        self._reference = options.get("reference")
        # driver-side: header + container-boundary walk per file
        # (reference CRAMInputFormat.getSplits, CRAMInputFormat.java:31-80)
        self._files: list[tuple[str, int, list[tuple[str, int]], list[str]]] = []
        for f in list_format_files(self._path, ".cram"):
            major, _text, refs, rgs, _pos = cram.read_cram_file_header(
                f, open_fn=fs.open_file
            )
            self._files.append((f, major, refs, rgs))

    def partitions(self) -> list[CRAMPartition]:
        parts: list[CRAMPartition] = []
        for path, _major, _refs, _rgs in self._files:
            offsets = [
                off for off, _hdr in cram.iter_container_offsets(path, open_fn=fs.open_file)
            ]
            if not offsets:
                continue
            # greedy container grouping to ~split_size compressed bytes
            bounds = [offsets[0]]
            for off in offsets[1:]:
                if off - bounds[-1] >= self._split_size:
                    bounds.append(off)
            # end sentinel: past the last container start; the executor stops
            # at the EOF container by itself
            bounds.append(offsets[-1] + 1)
            parts.extend(
                CRAMPartition(path, bounds[i], bounds[i + 1])
                for i in range(len(bounds) - 1)
            )
        return parts or [CRAMPartition("", 0, 0)]

    def read(self, partition: CRAMPartition):
        from hadoop_bam_spark.sources import arrow_batches, project_rows

        return arrow_batches(
            project_rows(self._rows(partition), self._keep), self._schema
        )

    def _rows(self, partition: CRAMPartition) -> Iterator[tuple]:
        if not partition.path:
            return
        major, refs, rgs = next(
            (m, r, g) for p, m, r, g in self._files if p == partition.path
        )
        ref_fasta = (cram.FastaRef(self._reference, open_fn=fs.open_file)
                     if self._reference else None)
        dec = cram.ContainerDecoder(major, refs, ref_fasta=ref_fasta, read_groups=rgs)
        with fs.open_file(partition.path, "rb") as fh:
            pos = partition.start
            while pos < partition.end:
                fh.seek(pos)
                head = fh.read(64)
                if len(head) < 8:
                    return
                hdr = cram.ContainerHeader.parse(head, 0, major)
                if hdr.ref_seq_id == -1 and hdr.n_records == 0 and hdr.start in (0, 0x454F46):
                    return  # EOF container
                fh.seek(pos + hdr.header_size)
                body = fh.read(hdr.length)
                yield from dec.decode(body, hdr)
                pos += hdr.header_size + hdr.length
