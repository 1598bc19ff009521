"""Window / analytic operators (SURVEY.md §2.5 W1-W5).

The reference consumes these pre-computed from the server
(CumulativeActualAmount, previousMonthRolloverAmount, oneDayChange…);
our engine *defines* the computation (SURVEY.md §7.5) as Spark window
functions.

Determinism: running sums cast to DECIMAL inside the window frame so the
ordered partial sums are exact (a double running sum is order-stable but
accumulates representation error that an oracle computes differently).
Partition keys bound cardinality (category/account), so window state
stays small per partition at any scale; nothing here induces a global
single-partition sort except ``row_number`` pagination, which is
page-sized by contract (see operators/transactions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dieter___etl___monarchmoney_spark.functions.money import MONEY_DECIMAL


def running_total(
    df: DataFrame,
    value_col: str,
    partition_by: str,
    order_by: str,
    out: str = "cumulative",
) -> DataFrame:
    """W1 — per-partition running total ordered by period
    (CumulativeActualAmount MonarchMoneyMain-v3.py:613; invariant
    "running total ≥ ActualAmount" .DevContext/Budget_Specs.md:189)."""
    w = (
        Window.partitionBy(partition_by)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(value_col).cast(MONEY_DECIMAL)).over(w).cast("double")
    return df.withColumn(out, cum)


def lag_over(
    df: DataFrame,
    value_col: str,
    partition_by: str,
    order_by: str,
    out: str,
    default: float | None = None,
) -> DataFrame:
    """W2/W4 — previous-row value per partition
    (previousMonthRolloverAmount monarchmoney.py:1147;
    oneDayChange monarchmoney.py:764-765)."""
    w = Window.partitionBy(partition_by).orderBy(order_by)
    lagged = F.lag(F.col(value_col), 1, default).over(w)
    return df.withColumn(out, lagged)


def remaining_amount(
    planned: Column | str, rollover: Column | str, actual: Column | str
) -> Column:
    """W3 — remaining = planned + rollover − actual
    (monarchmoney.py:1146, MonarchMoneyMain-v3.py:614). Callers ensure
    inputs are already-deterministic doubles."""
    p = F.col(planned) if isinstance(planned, str) else planned
    r = F.col(rollover) if isinstance(rollover, str) else rollover
    a = F.col(actual) if isinstance(actual, str) else actual
    return p + F.coalesce(r, F.lit(0.0)) - a
