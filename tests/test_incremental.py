"""Incremental load protocol tests (SURVEY.md §2.9 T1-T4, §3.1 steps 5-10):
watermark lifecycle, window derivation with force flags, replace-window
idempotence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.sources.parquet import load_table
from dieter___etl___monarchmoney_spark.streaming.incremental import (
    derive_window,
    read_watermark,
    replace_window_merge,
    reset_control,
    run_incremental_load,
    write_watermark,
)
from tests.conftest import SF_SMOKE

NOW = dt.datetime(2024, 3, 1, 12, 0, 0)


def test_watermark_roundtrip(spark, tmp_path):
    ctl = str(tmp_path / "control")
    assert read_watermark(spark, ctl) is None
    write_watermark(spark, ctl, NOW)
    assert read_watermark(spark, ctl) == NOW
    reset_control(spark, ctl)
    assert read_watermark(spark, ctl) is None  # blank value -> backfill


def test_corrupt_existing_control_raises_not_backfills(spark, tmp_path):
    # absence is an existence check, never an exception catch: a
    # transient/corrupt read on an EXISTING control must surface — the
    # swallowed form silently reclassified an up-to-date deployment as
    # never-run and triggered a full multi-year re-extract
    import pytest

    ctl = tmp_path / "control"
    ctl.mkdir()
    (ctl / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        read_watermark(spark, str(ctl))


def test_derive_window_policies():
    wm = dt.datetime(2024, 2, 10, 8, 30)
    # normal: start-of-day of the watermark (MonarchMoneyMain-v3.py:1250-1258)
    assert derive_window(wm, NOW) == (dt.date(2024, 2, 10), NOW)
    # no watermark -> backfill_days
    start, _ = derive_window(None, NOW, backfill_days=10)
    assert start == dt.date(2024, 2, 20)
    # FORCE_FULL_REFRESH ignores the watermark
    start, _ = derive_window(wm, NOW, backfill_days=10, force_full_refresh=True)
    assert start == dt.date(2024, 2, 20)
    # FORCE_START_DATE overrides everything
    start, _ = derive_window(wm, NOW, force_start_date=dt.date(2023, 1, 1))
    assert start == dt.date(2023, 1, 1)


def test_replace_window_merge_semantics(spark):
    existing = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 1.0), ("b", dt.date(2024, 2, 1), 2.0)],
        ["id", "d", "v"],
    )
    fresh = spark.createDataFrame(
        [("b", dt.date(2024, 2, 1), 99.0), ("c", dt.date(2024, 2, 2), 3.0)],
        ["id", "d", "v"],
    )
    merged = replace_window_merge(existing, fresh, "d", dt.date(2024, 2, 1))
    got = {r["id"]: r["v"] for r in merged.collect()}
    # 'a' kept (before window), 'b' replaced by fresh value, 'c' added
    assert got == {"a": 1.0, "b": 99.0, "c": 3.0}


def test_run_incremental_load_idempotent(spark, tmp_path):
    sink = str(tmp_path / "sink")
    ctl = str(tmp_path / "ctl")
    events = load_table(spark, "events", SF_SMOKE).select(
        "event_id", F.col("ts").cast("date").alias("d"), "value"
    )
    m1 = run_incremental_load(
        spark,
        source=events,
        sink_path=sink,
        control_path=ctl,
        date_col="d",
        now=dt.datetime(2024, 1, 20),
        backfill_days=3650,
    )
    n1 = spark.read.parquet(sink).count()
    assert m1["fresh_rows"] == n1 > 0
    # second run from the new watermark re-extracts only the last day's
    # window and replaces it — total row count must be unchanged
    m2 = run_incremental_load(
        spark,
        source=events,
        sink_path=sink,
        control_path=ctl,
        date_col="d",
        now=dt.datetime(2024, 1, 20),
        backfill_days=3650,
    )
    n2 = spark.read.parquet(sink).count()
    assert n2 == n1
    assert m2["fresh_rows"] < m1["fresh_rows"]
    assert m2["window_start"] == "2024-01-20"
    # watermark advanced
    assert read_watermark(spark, ctl) == dt.datetime(2024, 1, 20)
