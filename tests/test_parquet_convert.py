"""Land-once columnar conversion: BAM -> contig-partitioned sorted Parquet
with partition pruning verified in the physical plan."""

import os

import pytest
from pyspark.sql import functions as F

RES = "/root/reference/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{RES}/test.bam"), reason="reference fixtures absent"
)


@pytest.fixture()
def fmt_spark(spark):
    from hadoop_bam_spark.sources import register_all

    register_all(spark)
    return spark


def test_bam_to_partitioned_parquet_prunes(fmt_spark, tmp_path):
    from hadoop_bam_spark import sinks

    src = fmt_spark.read.format("bam").load(f"{RES}/test.bam")
    out = str(tmp_path / "reads.parquet")
    sinks.write_parquet_reads(src, out, range_partitions=2)

    # hive layout: one directory per contig
    dirs = {d for d in os.listdir(out) if d.startswith("rname=")}
    assert len(dirs) >= 1

    back = fmt_spark.read.parquet(out)
    assert back.count() == src.count()

    # a contig predicate must reach the scan as a PartitionFilter,
    # not a post-scan Filter
    contig = src.filter(F.col("rname").isNotNull()).first().rname
    pruned = back.filter(F.col("rname") == contig)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert f"rname#" in plan
    # row counts match the source-side filter
    assert pruned.count() == src.filter(F.col("rname") == contig).count()

    # rows inside each file arrive pos-sorted (row-group min/max skipping)
    import pyarrow.parquet as pq

    part_dir = os.path.join(out, f"rname={contig}")
    for f in os.listdir(part_dir):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(part_dir, f), columns=["pos"])
            vals = t.column("pos").to_pylist()
            assert vals == sorted(vals)
