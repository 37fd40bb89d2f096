"""Streaming GFF3/GTF ingest: ``spark.readStream.format("gff_stream")``.

Tails a landing directory for new ``.gff``/``.gff3``/``.gtf`` files
(and their ``.gz``/``.bgz`` forms — the batch source's spellings) — the
continuously-delivered annotation feed (gene-model updates, fresh
feature calls, including this engine's own gff shard-sink output)
joined downstream against read or variant streams. Same
exactly-once/.tbi-pruning/manifest-tailing/stringency contract as
``bed_stream``; built on the shared text-tail machinery
(streaming/text_stream.py).
"""

from __future__ import annotations

from hadoop_bam_spark.formats.gff import GFF_SCHEMA, parse_gff_line
from hadoop_bam_spark.streaming.text_stream import make_text_stream_source

_EXTS = (".gff", ".gff3", ".gtf", ".gff.gz", ".gff3.gz", ".gtf.gz",
         ".gff.bgz", ".gff3.bgz", ".gtf.bgz")

GFFStreamDataSource = make_text_stream_source(
    "gff_stream", GFF_SCHEMA, _EXTS, parse_gff_line, coords=(0, 3, 4)
)
