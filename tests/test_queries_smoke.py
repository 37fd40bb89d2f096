"""Smoke tests: every registered query runs at sf0.001 and the driver
contract (__spark_entry__) holds. Full oracle comparison runs via
hadoop_bam_spark.tools.check_oracle (and the driver's own gate at sf0.01).
"""

import pytest

from tests.conftest import SF_SMOKE


def _registry():
    from hadoop_bam_spark.queries import REGISTRY

    return REGISTRY


def test_registry_nonempty():
    assert len(_registry()) >= 30


def test_every_query_has_doc():
    for name, spec in _registry().items():
        assert spec.doc, f"{name} missing doc"


@pytest.mark.parametrize("name", sorted(_registry().keys()))
def test_query_runs(spark, name):
    spec = _registry()[name]
    df = spec.fn(spark, SF_SMOKE)
    rows = df.limit(5).collect()
    assert df.columns, f"{name} produced no columns"
    assert rows is not None


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles).issubset(set(qs))
    assert len(qs) >= 30


def test_oracle_sql_is_valid_duckdb(duck):
    """Every oracle parses and runs in DuckDB (sf0.01 views registered)."""
    from hadoop_bam_spark.queries import REGISTRY

    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        duck.execute(spec.oracle).fetchall()
