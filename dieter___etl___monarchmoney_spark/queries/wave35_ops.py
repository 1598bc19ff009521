"""Wave 35 (round 6): signed global running balance via the two-phase
distributed prefix sum.

Reference analog: the reference computes running balances serially in
pandas (``cumsum`` over the sorted snapshot frame,
MonarchMoneyMain-v3.py's balance deltas); this is that semantic at
cluster scale, over a SIGNED amount stream — the input class the
round-5 advice found ``distributed_prefix_sum`` silently mishandled
(its partition totals were max-of-prefix, wrong once values go
negative). The driver row is the regression proof: purchases credit,
everything else debits, so every range partition's local running sum
is non-monotone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

#: exact-decimal signed amount — double summation order differs between
#: a range-partitioned two-phase scan and the oracle's single
#: sequential window, so the amount MUST be an order-independent
#: decimal (the money_sum contract, functions/money.py) for the
#: running balance to match bit-for-bit.
_AMOUNT_SQL = """CASE WHEN event_type = 'purchase'
         THEN CAST(value AS DECIMAL(18,6))
         ELSE -CAST(value AS DECIMAL(18,6)) END"""

_BALANCE_SQL = f"""
SELECT event_id,
       CAST(SUM({_AMOUNT_SQL}) OVER (
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS balance
FROM events
ORDER BY event_id
"""


@query("signed_running_balance", _BALANCE_SQL)
def q_signed_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running balance over the event stream — purchases
    credit, every other event type debits — ordered by (ts, event_id).

    Scale shape: the oracle's ``SUM() OVER (ORDER BY …)`` is the
    classic single-reducer scale-killer (one global sort partition);
    the Spark side runs ``distributed_prefix_sum`` instead — range
    shuffle + per-partition window + P-row driver offsets
    (operators/prefix.py) — so the plan is P-way parallel at any
    scale. Signed amounts are the point: partition totals are
    SUM(amount), not max-of-prefix, and the amount is exact decimal so
    the two-phase addition order can't drift from the oracle's
    sequential one."""
    from dieter___etl___monarchmoney_spark.operators.prefix import (
        distributed_prefix_sum,
    )

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "ts",
        F.when(
            F.col("event_type") == "purchase",
            F.col("value").cast("decimal(18,6)"),
        )
        .otherwise(-F.col("value").cast("decimal(18,6)"))
        .alias("amount"),
    )
    out = distributed_prefix_sum(
        ev, ["ts", "event_id"], "amount", "balance", num_ranges=32
    )
    return out.select(
        "event_id", F.col("balance").cast("double").alias("balance")
    ).orderBy("event_id")
