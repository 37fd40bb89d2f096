"""Streaming BCF sink: ``df.writeStream.format("bcf")``.

Fourth member of the streaming shard-sink family (protocol shared with
:mod:`hadoop_bam_spark.streaming.bam_sink`): each micro-batch lands as
one complete standalone BGZF BCF2 per non-empty partition
(``batch-{batchId:05d}-{i:05d}.bcf``, the merged file's exact layout —
header block closing its own BGZF stream, records on a block boundary,
EOF appended). ``bcf_stream`` tails the output; the batch ``bcf``
source reads the directory.

Options:
  ``path``    target directory (required).
  ``header``  path to a VCF file supplying the ##-header (required; the
              sample columns come from it too).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceStreamWriter, WriterCommitMessage

from hadoop_bam_spark import fs
from hadoop_bam_spark.sources import local_path


@dataclass
class BcfShardCommit(WriterCommitMessage):
    staged: str | None
    records: int


class BCFStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("bcf stream sink requires a path (directory)")
        header_src = options.get("header")
        if not header_src:
            raise ValueError(
                "bcf stream sink requires option('header', <vcf path>)"
            )
        from hadoop_bam_spark.formats.bcf import parse_bcf_header_text
        from hadoop_bam_spark.formats.vcf import read_vcf_header

        self._dir = local_path(path)
        hdr = read_vcf_header(local_path(header_src))
        self._bhdr = parse_bcf_header_text(hdr.text)

    # -- executors ---------------------------------------------------------
    def write(self, iterator) -> BcfShardCommit:
        from pyspark import TaskContext

        from hadoop_bam_spark.formats import bcf as bcfmod
        from hadoop_bam_spark.formats import bgzf

        ctx = TaskContext.get()
        staging = fs.join(self._dir, ".staging")
        fs.makedirs(staging)
        name = f"attempt-{ctx.taskAttemptId()}-p{ctx.partitionId():05d}.bcf"
        tmp = fs.join(staging, name)
        n = 0
        with fs.open_file(tmp, "wb") as f:
            hw = bgzf.BGZFWriter(f, write_terminator=False)
            hw.write(bcfmod.encode_header(self._bhdr))
            hw.close()
            w = bgzf.BGZFWriter(f, write_terminator=False)
            for r in iterator:
                row = (
                    r["contig"], r["start"], r["end"], r["id"], r["ref"],
                    r["alts"], r["qual"], r["filters"],
                    dict(r["info"] or {}),
                    [
                        (g["sample"], g["gt"], dict(g["fields"] or {}))
                        for g in (r["genotypes"] or [])
                    ] or None,
                )
                w.write(bcfmod.encode_record(row, self._bhdr))
                n += 1
            w.close()
            f.write(bgzf.BGZF_EOF)
        if n == 0:
            fs.remove(tmp)
            return BcfShardCommit(staged=None, records=0)
        return BcfShardCommit(staged=name, records=n)

    # -- driver ------------------------------------------------------------
    def commit(self, messages, batchId: int) -> None:
        import json

        staged = [m for m in messages if m is not None and m.staged]
        entries = []
        for i, m in enumerate(sorted(staged, key=lambda m: m.staged)):
            final = f"batch-{batchId:05d}-{i:05d}.bcf"
            fs.rename(fs.join(self._dir, ".staging", m.staged),
                      fs.join(self._dir, final))
            entries.append({"shard": final, "records": m.records,
                            "batch": batchId})
        if entries:
            with fs.open_file(fs.join(self._dir, "_manifest.jsonl"), "ab") as f:
                for e in entries:
                    f.write((json.dumps(e) + "\n").encode())

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and getattr(m, "staged", None):
                fs.remove(fs.join(self._dir, ".staging", m.staged))
