"""Streaming + sessionization queries (SURVEY.md §2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table
from dieter___etl___monarchmoney_spark.streaming.sessionize import sessionize_batch
from dieter___etl___monarchmoney_spark.streaming.stream_reader import (
    daily_rollup_stream,
    dedup_stream,
    read_events_stream,
    run_available_now,
)


@query(
    "streaming_daily_rollup",
    """
    SELECT CAST(ts AS DATE) AS date, event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
    """,
)
def q_streaming_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2/A5-A6 as Structured Streaming: file-source stream →
    watermarked tumbling daily window → availableNow execution. On a
    batch-complete source the result equals the batch daily rollup, so
    the oracle is the plain GROUP BY — proving the streaming path
    computes the same answer."""
    stream = daily_rollup_stream(read_events_stream(spark, sf_dir))
    return run_available_now(
        stream, f"daily_rollup_{abs(hash(sf_dir)) % 10_000}", state_partitions=8
    )


@query(
    "sessionization",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_break
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(is_break) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (batch form): 30-min-gap sessions per
    user via lag → break flag → running session counter. The streaming
    twin (applyInPandasWithState) lives in streaming/sessionize.py and
    is exercised in tests."""
    events = load_table(spark, "events", sf_dir)
    return sessionize_batch(events)


@query(
    "streaming_event_dedup",
    """
    SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS event_date
    FROM events
    """,
)
def q_streaming_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup via dropDuplicatesWithinWatermark (append mode):
    one row per (user, event type, day) with state bounded by the
    event-time watermark. On a batch-complete source the emitted set
    equals batch DISTINCT over the keys, so the oracle is plain SELECT
    DISTINCT — proving the stateful streaming path computes the same
    answer the relational form does."""
    stream = dedup_stream(read_events_stream(spark, sf_dir))
    return run_available_now(
        stream,
        f"event_dedup_{abs(hash(sf_dir)) % 10_000}",
        output_mode="append",
        state_partitions=8,
    )


@query(
    "streaming_enriched_rollup",
    """
    SELECT CAST(e.ts AS DATE) AS date, n.n_name AS nation,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY CAST(e.ts AS DATE), n.n_name
    """,
)
def q_streaming_enriched_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (the streaming operator family the batch J1
    enrichment maps to): the event stream joins the static customer →
    nation dimension — broadcast to every micro-batch, no stream-side
    shuffle for the join — then rolls up daily totals per nation under a
    watermark. On a batch-complete source the result equals the batch
    join + GROUP BY, which is the oracle."""
    from dieter___etl___monarchmoney_spark.streaming.stream_reader import (
        enriched_rollup_stream,
    )

    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    dim = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("nation"))
    stream = enriched_rollup_stream(read_events_stream(spark, sf_dir), dim)
    return run_available_now(
        stream, f"enriched_rollup_{abs(hash(sf_dir)) % 10_000}", state_partitions=8
    )


@query(
    "streaming_interval_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(p.ts AS TIMESTAMP) AS p_ts,
           v.event_id AS view_id,
           CAST(v.ts AS TIMESTAMP) AS v_ts
    FROM events p
    JOIN events v
      ON p.user_id = v.user_id
     AND v.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
    WHERE p.event_type = 'purchase' AND v.event_type = 'view'
    """,
)
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time bounds and watermarked
    state expiry (streaming/stream_reader.py:interval_join_stream):
    purchases matched to the same user's views in the preceding 10
    minutes. Two streams over the same file source (a self-join at the
    stream level); on a batch-complete source the appended pairs equal
    the batch interval join, which is the oracle."""
    from dieter___etl___monarchmoney_spark.streaming.stream_reader import (
        interval_join_stream,
    )

    ev = read_events_stream(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    stream = interval_join_stream(purchases, views, minutes=10)
    return run_available_now(
        stream,
        f"interval_join_{abs(hash(sf_dir)) % 10_000}",
        output_mode="append",
        # two stateful join sides x fixed per-store overhead: 8 stores
        # beat 32 by ~4x at test SF; production sizes to cores/query
        state_partitions=8,
    )
