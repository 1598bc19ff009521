"""Property-based tests (hypothesis) for the normalize/merge layers —
the test style the reference lacks entirely (SURVEY.md §5 'no
property-based testing'). One Spark job per test: hypothesis generates
the data, a single createDataFrame round-trips it."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from dieter___etl___monarchmoney_spark.functions.money import clean_currency, money_sum

MONEY = st.decimals(
    min_value=Decimal("-99999.99"), max_value=Decimal("99999.99"), places=2
)


@settings(max_examples=5, deadline=None)
@given(st.lists(MONEY, min_size=1, max_size=50))
def test_currency_clean_roundtrips_formatting(spark, values):
    """Formatting a 2dp amount the messy way ($, commas, parens) and
    cleaning it back recovers the amount exactly."""

    def messy(d: Decimal) -> str:
        s = f"{abs(d):,.2f}"
        return f"(${s})" if d < 0 else f"${s}"

    df = spark.createDataFrame([(messy(v),) for v in values], ["raw"])
    got = [r["c"] for r in df.select(clean_currency("raw").alias("c")).collect()]
    for g, v in zip(got, values):
        assert g is not None and math.isclose(g, float(v), abs_tol=1e-9)


@settings(max_examples=5, deadline=None)
@given(st.lists(MONEY, min_size=1, max_size=100), st.integers(1, 31))
def test_money_sum_is_exact_and_partition_independent(spark, values, parts):
    """money_sum equals the exact decimal sum regardless of partitioning
    (the determinism claim the oracle gate rests on)."""
    df = spark.createDataFrame([(float(v),) for v in values], ["v"]).repartition(parts)
    got = df.agg(money_sum("v").alias("s")).collect()[0]["s"]
    assert got == float(sum(values))


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.dates(dt.date(2024, 1, 1), dt.date(2024, 3, 1))),
        min_size=1,
        max_size=40,
    ),
    st.dates(dt.date(2024, 1, 1), dt.date(2024, 3, 1)),
)
def test_replace_window_merge_partitions_cleanly(spark, rows, wm):
    """Merging a frame with its own window slice is identity (up to row
    multiplicity): kept ∪ fresh == original when fresh == window."""
    from dieter___etl___monarchmoney_spark.streaming.incremental import (
        replace_window_merge,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, d) for i, (i2, d) in enumerate(rows) for _ in [i2]], ["id", "d"])
    fresh = df.filter(F.col("d") >= F.lit(wm.isoformat()))
    merged = replace_window_merge(df, fresh, "d", wm)
    assert sorted((r["id"], r["d"]) for r in merged.collect()) == sorted(
        (r["id"], r["d"]) for r in df.collect()
    )