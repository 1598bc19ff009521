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

import decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

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
        # Pinned so the partition totals the driver reads and the rows
        # the offsets are joined back to come from the SAME evaluation
        # (RangePartitioner samples its bounds; an unpinned re-eval
        # could re-draw them). The pin is deliberately NOT released
        # here: the returned DataFrame still reads from it, and Spark
        # evicts LRU cache blocks under memory pressure anyway. Callers
        # that loop over many prefix sums can spark.catalog.clearCache()
        # between iterations.
        .persist()
    )
    # Partition total = SUM(value), NOT max of the running prefix —
    # with negative values (running balances, deltas) the local prefix
    # is non-monotone and its max overstates the partition total.
    totals_df = local.groupBy(_PID).agg(F.sum(value).alias("t"))
    t_type = totals_df.schema["t"].dataType
    totals = {
        r[_PID]: r["t"] for r in totals_df.collect()
    }  # K-bounded: num_ranges rows
    if isinstance(t_type, DecimalType):
        zero = decimal.Decimal(0)
    elif isinstance(t_type, (DoubleType, FloatType)):
        zero = 0.0
    else:
        zero = 0
    offsets, running = [], zero
    for pid in range(num_ranges):
        offsets.append((pid, running))
        t = totals.get(pid)
        if t is not None:
            running = running + t
    spark = df.sparkSession
    # Offset column carries the aggregate's own type (bigint for
    # integral inputs, double/decimal otherwise) so the map-side add
    # below neither truncates nor raises on non-integral value columns.
    off_schema = StructType(
        [
            StructField(_PID, IntegerType(), False),
            StructField("__prefix_off", t_type, True),
        ]
    )
    off_df = spark.createDataFrame(offsets, off_schema)
    return (
        local.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.col(_LOCAL) + F.col("__prefix_off"))
        .drop(_PID, _LOCAL, "__prefix_off")
    )
