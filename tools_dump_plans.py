"""Dump explain('formatted') for the named queries into plans/r18/.

Usage: python tools_dump_plans.py <suffix> <query> [query ...]
e.g.  python tools_dump_plans.py after pileup_depth_histogram
"""
import sys

from hadoop_bam_spark.queries import REGISTRY
from hadoop_bam_spark.session import get_spark

suffix = sys.argv[1]
names = sys.argv[2:]
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("plan_dump")
for n in names:
    df = REGISTRY[n].fn(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out = f"plans/r18/{n}_{suffix}.txt"
    with open(out, "w") as fh:
        fh.write(plan)
    print(out, len(plan.splitlines()), "lines")
spark.stop()
