"""Round-4 wave 22: exact penny allocation — the finance-engineering
operator the reference's domain actually runs on: distribute an order
total across its lines proportionally such that the cent amounts sum
EXACTLY to the total (largest-remainder / Hamilton method). Pro-rata
rounding that doesn't re-add to the invoice total is the classic
finance-data bug; this operator makes the invariant structural.

Everything is BIGINT cent arithmetic — no floating point anywhere in
the allocation path, so both engines agree bit-for-bit and the
"allocations sum to the total, per order, always" invariant is a
property test, not a hope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table


_ALLOC_SQL = """
WITH lines AS (
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS w_cents
    FROM lineitem
),
orders_c AS (
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS total_cents
    FROM orders
),
sized AS (
    SELECT l.l_orderkey, l.l_linenumber, l.w_cents, o.total_cents,
           SUM(l.w_cents) OVER (PARTITION BY l.l_orderkey) AS w_total
    FROM lines l JOIN orders_c o ON o.o_orderkey = l.l_orderkey
),
based AS (
    SELECT l_orderkey, l_linenumber, total_cents,
           (total_cents * w_cents) // w_total AS base_cents,
           (total_cents * w_cents) % w_total AS rem,
           SUM((total_cents * w_cents) // w_total)
               OVER (PARTITION BY l_orderkey) AS base_sum
    FROM sized
),
ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey
                              ORDER BY rem DESC, l_linenumber) AS rk,
           total_cents - base_sum AS leftover
    FROM based
)
SELECT l_orderkey, l_linenumber,
       CAST(base_cents + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS allocated_cents
FROM ranked
ORDER BY l_orderkey, l_linenumber
"""


@query("penny_exact_allocation", _ALLOC_SQL)
def q_penny_exact_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder penny allocation: each order's total (cents)
    splits across its lines proportionally to extended price; floor
    shares first, then the leftover cents go to the lines with the
    largest remainders (line number breaks remainder ties). The
    defining invariant — per-order allocated cents sum EXACTLY to the
    order total — holds by construction and is property-tested.

    Determinism: the whole path is BIGINT cent arithmetic (prices
    quantize to DECIMAL(18,2) once, at the cent boundary); integer
    floor-division and modulo agree across engines for the positive
    operands here; no floating point touches an allocation.

    Scale shape: two windows over the ORDER partition (weight total,
    base-share total) and one remainder rank — all three share the
    single orderkey shuffle (~4 lines per partition key); the
    orders-side total broadcasts as a dim. The numerator
    total_cents·w_cents stays < 2⁶³ for any realistic invoice (the
    overflow guard belongs at ingestion; at 1e9-cent orders the
    product is 1e18 < 9.2e18)."""
    lines = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("w_cents"),
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("total_cents"),
    )
    w_ord = Window.partitionBy("l_orderkey")
    sized = lines.join(
        orders, F.col("o_orderkey") == F.col("l_orderkey")
    ).withColumn("w_total", F.sum("w_cents").over(w_ord))
    num = F.col("total_cents") * F.col("w_cents")
    based = sized.select(
        "l_orderkey",
        "l_linenumber",
        "total_cents",
        F.expr("(total_cents * w_cents) DIV w_total").alias("base_cents"),
        (num % F.col("w_total")).alias("rem"),
    ).withColumn("base_sum", F.sum("base_cents").over(w_ord))
    ranked = based.select(
        "l_orderkey",
        "l_linenumber",
        "base_cents",
        (F.col("total_cents") - F.col("base_sum")).alias("leftover"),
        F.row_number()
        .over(w_ord.orderBy(F.col("rem").desc(), "l_linenumber"))
        .alias("rk"),
    )
    return (
        ranked.select(
            "l_orderkey",
            "l_linenumber",
            (
                F.col("base_cents")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("allocated_cents"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
