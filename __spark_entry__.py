"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``dieter___etl___monarchmoney_spark.registry``: every
implemented operator from SURVEY.md §2 registers a (spark, sf_dir) ->
DataFrame callable plus a DuckDB-oracle SQL twin with identical column
aliases.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dieter___etl___monarchmoney_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (cashflow by category-group — the reference's most
    "real" query, SURVEY.md §3.3) on /root/testdata/sf0.001."""
    queries, _ = registry.load()
    return queries["cashflow_by_category_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = registry.load()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    """DuckDB-oracle SQL for each query (omitted ⇒ rows-only check)."""
    _, o = registry.load()
    return dict(o)
