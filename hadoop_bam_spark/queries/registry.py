"""Registry of named queries with DuckDB oracle SQL.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (usually) an
equivalent ANSI-SQL string DuckDB can evaluate over the same parquet files.
Column names are aliased identically on both sides — the correctness harness
sorts columns by name before hashing values.

Queries whose semantics are not SQL-expressible (custom stateful streaming,
iterative algorithms) register with ``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str] = None, doc: str = "", bench: bool = False):
    """Decorator registering a query implementation with its oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco
