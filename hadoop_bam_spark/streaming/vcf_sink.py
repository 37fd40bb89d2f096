"""Streaming VCF sink: ``df.writeStream.format("vcf")``.

The variant-side twin of the streaming BAM sink
(:mod:`hadoop_bam_spark.streaming.bam_sink` — see its docstring for the
staging + rename-commit protocol, shared verbatim): each micro-batch
lands as one complete standalone BGZF ``.vcf.bgz`` per non-empty
partition, committed into the target directory as
``batch-{batchId:05d}-{i:05d}.vcf.bgz`` under the shared replay-safe
per-batch manifest protocol (see
:mod:`hadoop_bam_spark.streaming.shard_commit`).
The batch ``vcf`` source reads the resulting directory natively
and ``vcf_stream`` can tail it.

Options:
  ``path``    target directory (required).
  ``header``  path to a VCF file whose ##-header and sample columns every
              shard carries (required).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceStreamWriter, WriterCommitMessage

from hadoop_bam_spark import fs
from hadoop_bam_spark.sources import local_path


@dataclass
class VcfShardCommit(WriterCommitMessage):
    staged: str | None
    records: int


class VCFStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("vcf stream sink requires a path (directory)")
        header_src = options.get("header")
        if not header_src:
            raise ValueError(
                "vcf stream sink requires option('header', <vcf path>): "
                "every shard is a standalone VCF and must carry the "
                "##-header and sample columns"
            )
        from hadoop_bam_spark.formats.vcf import read_vcf_header

        self._dir = local_path(path)
        hdr = read_vcf_header(local_path(header_src))
        self._header_text = hdr.text
        self._samples = hdr.samples

    # -- executors ---------------------------------------------------------
    def write(self, iterator) -> VcfShardCommit:
        from pyspark import TaskContext

        from hadoop_bam_spark.formats import bgzf
        from hadoop_bam_spark.formats.vcf import format_vcf_line

        ctx = TaskContext.get()
        staging = fs.join(self._dir, ".staging")
        fs.makedirs(staging)
        name = f"attempt-{ctx.taskAttemptId()}-p{ctx.partitionId():05d}.vcf.bgz"
        tmp = fs.join(staging, name)
        n = 0
        try:
            with fs.open_file(tmp, "wb") as f:
                w = bgzf.BGZFWriter(f, write_terminator=True)
                w.write(self._header_text.encode())
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
                    w.write(
                        (format_vcf_line(row, self._samples) + "\n").encode()
                    )
                    n += 1
                w.close()
        except BaseException:
            fs.remove(tmp)  # no orphaned attempt files on task failure
            raise
        if n == 0:
            fs.remove(tmp)
            return VcfShardCommit(staged=None, records=0)
        return VcfShardCommit(staged=name, records=n)

    # -- driver ------------------------------------------------------------
    def commit(self, messages, batchId: int) -> None:
        from hadoop_bam_spark.streaming.shard_commit import commit_shards

        commit_shards(self._dir, messages, batchId, ".vcf.bgz")

    def abort(self, messages, batchId: int) -> None:
        from hadoop_bam_spark.streaming.shard_commit import abort_shards

        abort_shards(self._dir, messages)
