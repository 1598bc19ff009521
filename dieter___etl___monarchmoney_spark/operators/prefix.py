"""Distributed global prefix sum — the scale-correct form of
``SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)``.

A naive global running total forces Spark to sort the whole input into
ONE window partition — the classic single-reducer scale-killer. The
two-phase form here is the textbook distributed scan:

1. range-partition on the order key (P ranges, P = cluster width) and
   compute an ordinary per-partition running sum — parallel, one local
   sort per partition (already sorted within ranges by the shuffle);
2. collect the P partition totals (K-bounded driver materialization:
   P rows, never data rows), prefix-sum them on the driver, and
   broadcast the P cumulative offsets back;
3. each row's global prefix = its local prefix + its partition's
   offset — a map-side add, no further shuffle.

Total cost: one range shuffle + one P-row collect, versus the naive
plan's full sort into a single task. This is the same
partial-then-offset decomposition Spark itself uses for
``zipWithIndex``.

Reference analog: the reference computes running balances serially in
pandas (``cumsum`` over the sorted frame, MonarchMoneyMain-v3.py's
snapshot deltas); this operator is that semantic at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__prefix_pid"
_LOCAL = "__prefix_local"


def distributed_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col,
    out_col: str,
    num_ranges: int = 32,
) -> DataFrame:
    """Append ``out_col`` = running sum of ``value_col`` over the
    global ``order_cols`` order (inclusive of the current row).

    ``order_cols`` must be a unique total order (pass tie-break keys);
    ``value_col`` may be a column name or Column expression. The
    result keeps the range partitioning, so a downstream
    ``sortWithinPartitions(order_cols)`` write emits globally sorted
    output without another shuffle.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    keys = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(num_ranges, *keys)
    # spark_partition_id() on a range-partitioned frame IS the range
    # index (RangePartitioner assigns partition 0 the lowest range), so
    # the driver-side offsets line up with the ranges by construction.
    local_w = (
        Window.partitionBy(_PID)
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = (
        ranged.withColumn(_PID, F.spark_partition_id())
        .withColumn(_LOCAL, F.sum(value).over(local_w))
        # pinned so the partition totals the driver reads and the rows
        # the offsets are joined back to come from the SAME evaluation
        .persist()
    )
    totals = {
        r[_PID]: r["t"]
        for r in local.groupBy(_PID).agg(F.max(_LOCAL).alias("t")).collect()
    }  # K-bounded: num_ranges rows
    offsets, running = [], 0
    for pid in range(num_ranges):
        offsets.append((pid, running))
        running += totals.get(pid, 0) or 0
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, f"{_PID} int, __prefix_off bigint")
    return (
        local.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.col(_LOCAL) + F.col("__prefix_off"))
        .drop(_PID, _LOCAL, "__prefix_off")
    )
