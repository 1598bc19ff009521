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
    """Read one star-schema table as a DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read every star-schema table; keys are table names."""
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works on it."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
