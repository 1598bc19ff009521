"""Parquet table sources.

Replaces the reference's GraphQL scans (SURVEY.md §2.1 S1-S9): where the
reference POSTs a query document and receives nested JSON, we
``spark.read.parquet`` and let Catalyst push filters/projections into the
scan (the reference's "server-side pushdown" — monarchmoney.py:1510-1550 —
becomes Parquet row-group pruning + column projection for free).

Scale notes: readers return un-collected DataFrames; no driver-side
materialization. Dimension tables (region/nation/customer/supplier/part)
are small enough to broadcast at any scale factor; fact tables
(orders/lineitem/events/documents/embeddings) scan distributed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: driver-supplied star schema (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: small dimensions safe to broadcast-hint in joins at any SF
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one star-schema table as a DataFrame.

    ``events.ts`` is a nanosecond parquet timestamp, which Spark's reader
    rejects (PARQUET_TYPE_ILLEGAL); we read it as a raw long and expose
    both ``ts`` (microsecond timestamp, lossy by <1µs) and ``ts_ns`` (the
    exact long) — ordering/joins that must match a ns-precision oracle
    use ``ts_ns``.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        # integer `div`, NOT floor(x/1000): double division of ~1e18 ns
        # values rounds at the 0.25µs ulp and can cross the floor boundary
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read every star-schema table; keys are table names."""
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works on it."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
