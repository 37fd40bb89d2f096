"""Streaming BED ingest: ``spark.readStream.format("bed_stream")``.

Tails a landing directory for new ``.bed`` / ``.bed.gz`` / ``.bed.bgz``
files — the continuously-delivered annotation/feature-feed pattern
(region blocklists, freshly-called peaks) joined downstream against
read or variant streams. Same contract as ``vcf_stream``: offsets are
the sorted processed-file list (exactly-once per file), interval
options prune whole deliveries via a ``.tbi`` sidecar before any byte
parses, and a shard-sink output directory is tailed through its
commit manifests. Built on the shared text-tail machinery
(streaming/text_stream.py).
"""

from __future__ import annotations

from hadoop_bam_spark.formats.bed import BED_SCHEMA, parse_bed_line
from hadoop_bam_spark.streaming.text_stream import make_text_stream_source

_EXTS = (".bed", ".bed.gz", ".bed.bgz")

BEDStreamDataSource = make_text_stream_source(
    "bed_stream", BED_SCHEMA, _EXTS, parse_bed_line
)
