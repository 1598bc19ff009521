"""Structured Streaming tests: availableNow rollup equivalence and the
stateful sessionizer vs its batch twin."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.sources.parquet import load_table
from dieter___etl___monarchmoney_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)
from dieter___etl___monarchmoney_spark.streaming.stream_reader import (
    daily_rollup_stream,
    read_events_stream,
    run_available_now,
)
from tests.conftest import SF_SMOKE


def test_streaming_rollup_equals_batch(spark):
    stream = daily_rollup_stream(read_events_stream(spark, SF_SMOKE))
    got = run_available_now(stream, "t_stream_rollup")
    batch = (
        load_table(spark, "events", SF_SMOKE)
        .groupBy(F.col("ts").cast("date").alias("date"), "event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    g = {(r["date"], r["event_type"]): (r["total_value"], r["n_events"]) for r in got.collect()}
    b = {(r["date"], r["event_type"]): (r["total_value"], r["n_events"]) for r in batch.collect()}
    assert g == b


def test_sessionize_stream_matches_batch(spark, tmp_path):
    # small deterministic event set written as a streaming source dir
    rows = []
    base = dt.datetime(2024, 1, 1)
    for u in (1, 2):
        t = base
        for i in range(6):
            # 10-min steps with a 2-hour gap in the middle -> 2 sessions
            t = t + dt.timedelta(minutes=120 if i == 3 else 10)
            rows.append((u * 100 + i, t, u, "e", 1.0))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type", "value"])
    df = df.withColumn("ts_ns", (F.col("ts").cast("long") * F.lit(1_000_000_000)))
    src = str(tmp_path / "events_src")
    df.write.parquet(src)

    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(df).collect()
    }
    assert len(batch) == 4  # 2 users x 2 sessions

    stream_in = spark.readStream.schema(df.schema).parquet(src)
    out = sessionize_stream(stream_in)
    q = (
        out.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("t_sessions").collect()
    }
    # the stream emits CLOSED sessions; the final open session per user
    # stays in state (no more data to advance the watermark past it)
    assert got <= batch
    assert len(got) >= 2  # at least the first session per user closed
    for row in got:
        assert row in batch