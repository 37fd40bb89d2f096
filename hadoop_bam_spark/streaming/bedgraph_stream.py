"""Streaming bedGraph ingest: ``spark.readStream.format("bedgraph_stream")``.

Tails a landing directory for new ``.bedgraph`` / ``.bedGraph`` / ``.bg``
files (and their ``.gz``/``.bgz`` forms — the same spellings the batch
source accepts) — the continuously-updated coverage-track feed
(depth drops from an upstream pipeline, e.g. this engine's own
coverage_track sink output) joined downstream against interval or
variant streams. Same exactly-once/.tbi-pruning/manifest-tailing
contract as ``bed_stream``; built on the shared text-tail machinery
(streaming/text_stream.py).
"""

from __future__ import annotations

from hadoop_bam_spark.formats.bedgraph import (
    BEDGRAPH_SCHEMA,
    parse_bedgraph_line,
)
from hadoop_bam_spark.streaming.text_stream import make_text_stream_source

_EXTS = (".bedgraph", ".bedGraph", ".bg",
         ".bedgraph.gz", ".bedgraph.bgz",
         ".bedGraph.gz", ".bedGraph.bgz", ".bg.gz", ".bg.bgz")

BedGraphStreamDataSource = make_text_stream_source(
    "bedgraph_stream", BEDGRAPH_SCHEMA, _EXTS, parse_bedgraph_line
)
