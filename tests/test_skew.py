"""Salted-aggregate correctness: the two-phase skew-safe aggregate must
equal the direct groupBy on a deliberately skewed frame."""

from __future__ import annotations

from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.functions.money import money_sum
from dieter___etl___monarchmoney_spark.operators.skew import salted_money_aggregate


def test_salted_aggregate_matches_direct(spark):
    # 90% of rows share one hot key
    rows = [("hot" if i % 10 != 9 else f"k{i % 7}", float(i % 100) / 4) for i in range(20_000)]
    df = spark.createDataFrame(rows, ["key", "value"])
    direct = {
        r["key"]: (r["sum"], r["count"])
        for r in df.groupBy("key")
        .agg(money_sum("value").alias("sum"), F.count(F.lit(1)).alias("count"))
        .collect()
    }
    salted = {
        r["key"]: (r["sum"], r["count"])
        for r in salted_money_aggregate(df, "key", "value", salt_buckets=8).collect()
    }
    assert salted == direct
