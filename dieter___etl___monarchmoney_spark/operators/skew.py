"""Skew-handling utilities (SURVEY.md "Optimize for scale": salting for
skewed keys).

AQE's skew-join handling covers sort-merge joins; salting is still the
tool for skewed AGGREGATIONS and for broadcast-ineligible joins with a
few hot keys. ``salted_aggregate`` is the two-phase pattern: aggregate
on (key, salt) — spreading one hot key over N reducers — then combine
the partials per key. Works for any algebraic aggregate; exposed here
for the money-sum + count shape the engine uses everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.functions.money import MONEY_DECIMAL


def salted_money_aggregate(
    df: DataFrame, key: str, value_col: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-safe aggregate: SUM(value), COUNT(*) per key.

    Phase 1 shuffles on (key, salt) — a hot key spreads across
    ``salt_buckets`` reducers; phase 2 combines the ≤salt_buckets
    partials per key (tiny shuffle). The salt is CONTENT-derived (hash
    of the whole row), never layout-derived (monotonically_increasing_id
    changes with file split planning): re-runs and replans produce the
    identical salt assignment, so the plan — not just the result — is
    reproducible. Identical duplicate rows share a salt bucket, which
    only matters if a hot key is made of bit-identical rows; aggregates
    stay order-independent (decimal sums) regardless.
    """
    salted = df.withColumn(
        "_salt",
        F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)),
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(F.col(value_col).cast(MONEY_DECIMAL)).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").cast("double").alias("sum"),
        F.sum("_pcnt").alias("count"),
    )
