"""End-to-end ETL lifecycle test (SURVEY.md §3.1): both runs idempotent,
watermark advances, all three sinks written."""

from __future__ import annotations

import datetime as dt

from dieter___etl___monarchmoney_spark.etl import run_etl
from dieter___etl___monarchmoney_spark.sources.sinks import read_sink
from dieter___etl___monarchmoney_spark.streaming.incremental import read_watermark
from tests.conftest import SF_SMOKE

NOW = dt.datetime(2000, 1, 1, 12, 0, 0)  # beyond all shipdates? no: inside range


def test_full_lifecycle_idempotent(spark, tmp_path):
    out = str(tmp_path / "warehouse")
    now = dt.datetime(1998, 6, 1, 12, 0, 0)  # mid-range: window replaces a slice
    m1 = run_etl(spark, SF_SMOKE, out, now=now)
    assert m1["rows"] > 0 and m1["budget_rows"] > 0
    txns1 = read_sink(spark, f"{out}/transactions")
    n1 = txns1.count()
    assert "loadedAtUtc" in txns1.columns and "AccDispName" in txns1.columns
    assert read_sink(spark, f"{out}/accounts").count() == 150
    assert read_watermark(spark, f"{out}/control") == now

    # re-run at the same "now": the window re-extracts and replaces,
    # so the row count must not change (reference idempotence, T2)
    m2 = run_etl(spark, SF_SMOKE, out, now=now)
    assert read_sink(spark, f"{out}/transactions").count() == n1
    # second window starts at the watermark day, not the backfill
    assert m2["window_start"] == "1998-06-01"
