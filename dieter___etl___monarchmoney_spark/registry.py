"""Driver-contract registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus its DuckDB-oracle SQL twin.

Conventions (driver contract, /root/repo/__spark_entry__.py docstring):
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before value-hashing);
- money aggregates use the exact-decimal-sum pattern
  (functions/money.py) so hashes cannot flake on double summation order;
- queries are registered via @query(name, sql) so the two surfaces can
  never drift apart structurally.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    """Register a driver-contract query; ``sql`` is the DuckDB oracle
    (None ⇒ non-SQL-expressible, rows-only check).

    Each registered callable first drops caches left behind by PRIOR
    queries: several operators persist() an intermediate that the
    returned lazy frame still depends on (edge tables, posting lists,
    covariance matrices), so they cannot unpersist before the caller
    materializes the result. In a long-lived session running the whole
    registry (driver rotation, bench — 168 queries × warm-up + timed
    loop) those pins would otherwise accumulate into GC pressure that
    slows every later query. Clearing at ENTRY is safe: by the time
    query N+1 starts, query N's result has been materialized and
    compared; at worst a re-collect recomputes.

    LIBRARY CAVEAT: the entry-time ``clearCache()`` is a
    driver-harness contract behavior. A caller composing registry
    callables with their OWN cached tables will find those caches
    dropped by every registry call — compose with the underlying
    operator modules (operators/, functions/) instead, which never
    touch session-global cache state."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)  # _reorder() keys on the copied __module__
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            try:
                spark.catalog.clearCache()
            except Exception:
                pass  # never let cache hygiene mask the query itself
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


# Importing the query modules populates the registry.
def _load_all() -> None:
    from dieter___etl___monarchmoney_spark import queries as _q  # noqa: F401


_LOADED = False


def load() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    global _LOADED
    if not _LOADED:
        _load_all()
        _LOADED = True
    return QUERIES, ORACLE_SQL
