"""Driver-shaped gate: every registered query with an oracle must match
DuckDB on sf0.01 (row count + column names + order-insensitive values)."""

from __future__ import annotations

import pytest

from dieter___etl___monarchmoney_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare

QUERIES, ORACLE_SQL = registry.load()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_ORACLE)
    duck_rel = duck.sql(ORACLE_SQL[name])
    compare(spark_df, duck_rel)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only(name, spark):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
