"""``spark.read.format("qseq")`` — QSEQ (11 tab-separated columns) scan.

Reproduces reference QseqRecordReader semantics (QseqInputFormat.java:
344-426): '.' no-call bases normalized to 'N'; qualities re-encoded from
Illumina Phred+64 to Sanger Phred+33 unless option("base_quality_encoding",
"sanger"); newline-boundary split realignment is the standard text rule.
Output schema = the FASTQ/SequencedFragment schema so both sources feed the
same pipelines.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader

from hadoop_bam_spark.sources.fastq_source import FASTQ_SCHEMA
from hadoop_bam_spark.sources.sam_source import TextRangePartition, iter_lines, plan_text_splits

_P64_TO_P33 = bytes(
    max(33, min(126, q - 31)) if 33 <= q <= 126 else q for q in range(256)
)


def parse_qseq_line(line: str, recode_quality: bool) -> tuple:
    f = line.split("\t")
    if len(f) != 11:
        raise ValueError(f"QSEQ line has {len(f)} fields, expected 11")
    (instr, run, lane, tile, x, y, index, read, seq, qual, filt) = f
    seq = seq.replace(".", "N")  # QseqInputFormat.java:403-409
    if recode_quality:
        qual = qual.encode("latin-1").translate(_P64_TO_P33).decode("latin-1")
    name = f"{instr}:{run}:{lane}:{tile}:{x}:{y}"
    return (
        name, seq, qual, instr, int(run), None, int(lane), int(tile),
        int(x), int(y), int(read), filt == "1", None,
        index if index not in ("", "0") else None,
    )


class QseqDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "qseq"

    def schema(self):
        from hadoop_bam_spark.sources import pruned_schema

        return pruned_schema(FASTQ_SCHEMA, self.options)[0]

    def reader(self, schema) -> "QseqReader":
        return QseqReader(self.options)


class QseqReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("qseq source requires a path")
        self._path = path
        self._split_size = int(options.get("split_size", 32 * 1024 * 1024))
        # input quality encoding: illumina (default, recode) or sanger
        self._recode = options.get("base_quality_encoding", "illumina") == "illumina"
        self._filter_failed = options.get("filter_failed_qc", "false").lower() == "true"
        from hadoop_bam_spark.sources import pruned_schema, stringency_option

        self._stringency = stringency_option(options)
        self._schema, self._keep = pruned_schema(FASTQ_SCHEMA, options)

    def partitions(self):
        return plan_text_splits(self._path, self._split_size, (".qseq", ".txt"))

    def read(self, partition: TextRangePartition):
        from hadoop_bam_spark.sources import arrow_batches, project_rows

        return arrow_batches(
            project_rows(self._rows(partition), self._keep), self._schema
        )

    def _rows(self, partition: TextRangePartition) -> Iterator[tuple]:
        from hadoop_bam_spark.sources import apply_stringency

        for line in iter_lines(partition):
            if not line:
                continue
            try:
                rec = parse_qseq_line(line, self._recode)
            except ValueError as e:
                apply_stringency(self._stringency, e, "qseq")
                continue
            if self._filter_failed and rec[11] is False:
                continue
            yield rec
