"""Remaining SURVEY §2.8/§2.9 helpers: date-key heuristic (F5), retry
policy (T6), JSON/CSV sinks (K3/K4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.functions.dates import find_date_key
from dieter___etl___monarchmoney_spark.sources.json_ingest import with_retries
from dieter___etl___monarchmoney_spark.sources.sinks import write_csv, write_json


def test_find_date_key(spark):
    df = spark.createDataFrame([("a",)], ["name"]).withColumn(
        "txn_date", F.lit("2024-01-01").cast("date")
    )
    assert find_date_key(df) == "txn_date"
    # known name wins over other date-typed columns
    df2 = df.withColumn("date", F.lit("2024-01-02").cast("date"))
    assert find_date_key(df2) == "date"
    # string 'date' column does NOT count (typed engine reads schema)
    df3 = spark.createDataFrame([("2024-01-01", 5)], ["date", "v"])
    assert find_date_key(df3) is None


def test_with_retries():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ConnectionError("525")
        return "ok"

    slept = []
    assert with_retries(flaky, attempts=3, delay_s=5, sleep=slept.append) == "ok"
    assert len(calls) == 3 and slept == [5, 5]

    def always_fails():
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        with_retries(always_fails, attempts=2, sleep=lambda _: None)


def test_json_csv_sinks_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", -2.0)], ["id", "s", "v"])
    jp, cp = str(tmp_path / "j"), str(tmp_path / "c")
    write_json(df, jp)
    write_csv(df, cp)
    assert spark.read.json(jp).count() == 2
    back = spark.read.option("header", True).csv(cp)
    assert back.count() == 2 and back.columns == ["id", "s", "v"]