"""Query corpus: every implemented operator gets a named query + DuckDB oracle.

``REGISTRY`` maps name -> QuerySpec(spark_fn, oracle_sql). The driver contract
(__spark_entry__.py) exposes these via ``queries()`` / ``oracle_sql()``.
"""

from hadoop_bam_spark.queries.registry import REGISTRY, QuerySpec, query

# Import for registration side effects.
from hadoop_bam_spark.queries import relational  # noqa: E402,F401
from hadoop_bam_spark.queries import genomics  # noqa: E402,F401
from hadoop_bam_spark.queries import pipeline  # noqa: E402,F401
from hadoop_bam_spark.queries import formats_gate  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
