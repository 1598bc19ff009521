"""Aggregate-semantics parity tests against hand-computed expectations,
mirroring the reference's golden-fixture style for the summary fields
(tests/get_transactions_summary.json: max can be negative, maxExpense is
the min of negatives, first/last are date bounds)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.functions.nested import scalarize_to_json
from dieter___etl___monarchmoney_spark.operators.aggregates import (
    cashflow_report,
    transactions_summary,
)


def _txns(spark):
    rows = [
        ("t1", 100.0, dt.date(2021, 1, 1), "food", "m1"),
        ("t2", -40.5, dt.date(2022, 6, 15), "food", "m2"),
        ("t3", -1000.0, dt.date(2023, 3, 3), "rent", "m1"),
        ("t4", 250.25, dt.date(2024, 2, 9), "salary", "m3"),
    ]
    return spark.createDataFrame(
        rows, ["txn_id", "amount", "txn_date", "category_id", "merchant_id"]
    )


def test_summary_nine_fields(spark):
    r = transactions_summary(_txns(spark)).collect()[0]
    assert r["count"] == 4
    assert r["sum"] == pytest.approx(100.0 - 40.5 - 1000.0 + 250.25)
    assert r["sumIncome"] == pytest.approx(350.25)
    assert r["sumExpense"] == pytest.approx(-1040.5)
    assert r["max"] == pytest.approx(250.25)
    assert r["maxExpense"] == pytest.approx(-1000.0)  # min-of-negatives
    assert r["avg"] == pytest.approx((100.0 - 40.5 - 1000.0 + 250.25) / 4)
    assert r["first"] == dt.date(2021, 1, 1)
    assert r["last"] == dt.date(2024, 2, 9)


def test_summary_all_negative_amounts(spark):
    """The fixture's edge: max is negative when every amount is
    (get_transactions_summary.json has max=-1000)."""
    df = spark.createDataFrame(
        [("a", -5.0, dt.date(2021, 1, 1)), ("b", -1000.0, dt.date(2021, 1, 2))],
        ["txn_id", "amount", "txn_date"],
    )
    r = transactions_summary(df).collect()[0]
    assert r["max"] == -5.0 and r["maxExpense"] == -1000.0
    assert r["sumIncome"] == 0.0  # fillEmptyValues semantics


def test_cashflow_report_branches(spark):
    rep = cashflow_report(_txns(spark), category_col="category_id")
    by_cat = {r["category_id"]: r["sum"] for r in rep["byCategory"].collect()}
    assert by_cat == {
        "food": pytest.approx(59.5),
        "rent": pytest.approx(-1000.0),
        "salary": pytest.approx(250.25),
    }
    s = rep["summary"].collect()[0]
    assert s["savings"] == pytest.approx(350.25 - 1040.5)
    assert s["savingsRate"] == pytest.approx((350.25 - 1040.5) / 350.25)
    assert set(rep) == {"byCategory", "byMerchant", "summary"}


def test_scalarize_to_json(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(s=Row(a=1, b="x"), arr=[1, 2])])
    got = df.select(
        scalarize_to_json("s").alias("sj"), scalarize_to_json("arr").alias("aj")
    ).collect()[0]
    assert got["sj"] == '{"a":1,"b":"x"}'
    assert got["aj"] == "[1,2]"