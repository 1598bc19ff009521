"""Budget pipeline over the star schema (SURVEY.md §7.3 step 5): the
full sheet — category×month rows, group sentinel rows (998), Totals
rows (999) — with classification, remaining arithmetic and cumulative
windows, oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.functions.money import money_sum
from dieter___etl___monarchmoney_spark.operators.budgets import budget_pipeline
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table
from dieter___etl___monarchmoney_spark.sources.star_model import (
    TRANSACTIONS_SQL,
    transactions,
)

_MSUM = "CAST(SUM(CAST({x} AS DECIMAL(18,6))) AS DOUBLE)"

_INCOME_TYPES = "('ECONOMY', 'PROMO')"

_BUDGET_SQL = f"""
WITH cat AS (
    SELECT p.p_brand || '|' || p.p_type AS category_id,
           p.p_brand AS CategoryName,
           p.p_type AS CategoryGroupName,
           CASE WHEN p.p_type IN {_INCOME_TYPES} THEN 'income' ELSE 'expense' END
               AS GroupType,
           CAST(DATE_TRUNC('month', t.txn_date) AS DATE) AS Month,
           CAST(10000.0 AS DOUBLE) AS PlannedAmount,
           {_MSUM.format(x='t.amount')} AS ActualAmount,
           CAST(0.0 AS DOUBLE) AS RolloverAmount
    FROM ({TRANSACTIONS_SQL}) t
    JOIN part p ON t.category_id = p.p_partkey
    GROUP BY 1, 2, 3, 4, 5
),
catrows AS (
    SELECT Month, CategoryGroupName, CategoryName, GroupType,
           CASE WHEN GroupType = 'income' THEN 'Credit' ELSE 'Debit' END
               AS DebitCreditFlag,
           PlannedAmount, ActualAmount, RolloverAmount,
           PlannedAmount + RolloverAmount - ActualAmount AS RemainingAmount,
           CAST(SUM(CAST(ActualAmount AS DECIMAL(18,6)))
                OVER (PARTITION BY category_id ORDER BY Month
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS CumulativeActualAmount,
           0 AS GroupOrder
    FROM cat
),
grprows AS (
    SELECT Month, CategoryGroupName, '' AS CategoryName, GroupType,
           CASE WHEN GroupType = 'income' THEN 'Credit' ELSE 'Debit' END
               AS DebitCreditFlag,
           {_MSUM.format(x='PlannedAmount')} AS PlannedAmount,
           {_MSUM.format(x='ActualAmount')} AS ActualAmount,
           {_MSUM.format(x='RolloverAmount')} AS RolloverAmount,
           {_MSUM.format(x='RemainingAmount')} AS RemainingAmount,
           CAST(NULL AS DOUBLE) AS CumulativeActualAmount,
           998 AS GroupOrder
    FROM catrows GROUP BY Month, CategoryGroupName, GroupType
),
totrows AS (
    SELECT Month, 'Totals' AS CategoryGroupName, '' AS CategoryName,
           CAST(NULL AS VARCHAR) AS GroupType,
           'Debit' AS DebitCreditFlag,
           {_MSUM.format(x='PlannedAmount')} AS PlannedAmount,
           {_MSUM.format(x='ActualAmount')} AS ActualAmount,
           {_MSUM.format(x='RolloverAmount')} AS RolloverAmount,
           {_MSUM.format(x='RemainingAmount')} AS RemainingAmount,
           CAST(NULL AS DOUBLE) AS CumulativeActualAmount,
           999 AS GroupOrder
    FROM catrows GROUP BY Month
)
SELECT Month, CategoryGroupName, CategoryName, GroupType, DebitCreditFlag,
       PlannedAmount, ActualAmount, RolloverAmount, RemainingAmount,
       CumulativeActualAmount, GroupOrder
FROM (SELECT * FROM catrows UNION ALL SELECT * FROM grprows
      UNION ALL SELECT * FROM totrows)
"""


@query("budget_pipeline_full", _BUDGET_SQL)
def q_budget_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3 + W1-W3 + A4 + F15-F17 + O2/O3 — the complete budget sheet
    (_process_budget_data MonarchMoneyMain-v3.py:536-876): part plays the
    category dim (brand=category, type=group); planned is a fixed monthly
    budget; actuals come from the transactions fact."""
    txns = transactions(spark, sf_dir)
    part = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("part_key"),
        F.col("p_brand").alias("CategoryName"),
        F.col("p_type").alias("CategoryGroupName"),
    )
    enriched = txns.join(
        F.broadcast(part), txns.category_id == part.part_key, "inner"
    )
    per_cat_month = (
        enriched.groupBy(
            F.concat_ws("|", "CategoryName", "CategoryGroupName").alias("category_id"),
            "CategoryName",
            "CategoryGroupName",
            F.when(
                F.col("CategoryGroupName").isin("ECONOMY", "PROMO"), "income"
            ).otherwise("expense").alias("GroupType"),
            F.date_trunc("month", "txn_date").cast("date").alias("Month"),
        )
        .agg(money_sum("amount").alias("ActualAmount"))
        .withColumn("PlannedAmount", F.lit(10000.0))
        .withColumn("RolloverAmount", F.lit(0.0))
    )
    return budget_pipeline(per_cat_month)
