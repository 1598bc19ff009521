"""Round-4 wave 19: evaluation compositions — operators that JUDGE
other operators' outputs, closing loops the earlier waves opened:

- ``seasonal_naive_backtest``: the forecasting baseline every real
  forecast must beat (predict day t with day t-7), scored with WAPE —
  backtesting as a first-class query, next to the ACF that detects the
  seasonality being exploited;
- ``session_dwell_metrics``: the product metrics computed FROM the
  sessionization operator's output (bounce rate, dwell-time order
  statistics) — sessions are rarely the deliverable, their summary is;
- ``component_size_distribution``: the dup-cluster size histogram +
  giant-component share — the first thing to inspect before trusting a
  dedup pass (a giant component usually means the similarity threshold
  collapsed the corpus).

Each composes an existing operator's exact semantics (its oracle rides
inside this oracle as a subquery), so a green row here ALSO re-checks
the upstream operator through a second lens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.queries.llm_pipeline import _CLUSTERS_SQL
from dieter___etl___monarchmoney_spark.queries.streaming_queries import (
    _SESSIONIZATION_ORACLE,
)
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table
from dieter___etl___monarchmoney_spark.streaming.sessionize import sessionize_batch

_DEC = "decimal(18,6)"


# --------------------------------------------------------------------------
# Seasonal-naive backtest (WAPE per event type)
# --------------------------------------------------------------------------

_LAG_DAYS = 7

_BACKTEST_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
    FROM events GROUP BY 1, 2
),
paired AS (
    SELECT a.event_type, a.d, a.v, f.v AS fcast
    FROM daily a
    JOIN daily f ON f.event_type = a.event_type
                AND f.d = a.d - INTERVAL {_LAG_DAYS} DAY
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(CAST(ABS(v - fcast) AS DECIMAL(18,6))) AS DOUBLE)
           AS total_abs_err,
       CAST(SUM(CAST(ABS(v) AS DECIMAL(18,6))) AS DOUBLE) AS total_abs_actual,
       CAST(SUM(CAST(ABS(v - fcast) AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(SUM(CAST(ABS(v) AS DECIMAL(18,6))) AS DOUBLE) AS wape
FROM paired
GROUP BY event_type
ORDER BY event_type
"""


@query("seasonal_naive_backtest", _BACKTEST_SQL)
def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: predict each day's per-type total with
    the value {LAG} days earlier, scored with WAPE (Σ|err| / Σ|actual|
    — the ratio of two exact-decimal sums, robust where per-day MAPE
    divides by near-zero days). This is the baseline every forecasting
    model must beat, and the evaluation loop for the weekly
    seasonality hourly_value_acf detects.

    Lag alignment is by DATE ARITHMETIC (d - {LAG} days), not row
    offset — the same gap-safety contract as the ACF. At 100 TB the
    fact collapses to a (type, day) frame in one aggregate before any
    pairing; the self-join keys on (type, day), both sides
    day-cardinality."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.sum(F.col("value").cast(_DEC)).cast("double").alias("v"))
    )
    fc = daily.select(
        F.col("event_type").alias("et2"),
        F.date_add(F.col("d"), _LAG_DAYS).alias("d2"),
        F.col("v").alias("fcast"),
    )
    paired = daily.join(
        fc, (F.col("et2") == F.col("event_type")) & (F.col("d2") == F.col("d"))
    )
    err = F.abs(F.col("v") - F.col("fcast")).cast(_DEC)
    act = F.abs(F.col("v")).cast(_DEC)
    return (
        paired.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(err).cast("double").alias("total_abs_err"),
            F.sum(act).cast("double").alias("total_abs_actual"),
        )
        .select(
            "event_type",
            "n_days",
            "total_abs_err",
            "total_abs_actual",
            (F.col("total_abs_err") / F.col("total_abs_actual")).alias("wape"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Session dwell metrics (composed over the sessionization operator)
# --------------------------------------------------------------------------

_DWELL_SQL = f"""
WITH sessions AS (
    SELECT * FROM ({_SESSIONIZATION_ORACLE}) s
),
dur AS (
    SELECT session_end_us - session_start_us AS dwell_us, n_events,
           ROW_NUMBER() OVER (ORDER BY session_end_us - session_start_us)
               - 1 AS i,
           COUNT(*) OVER () AS n
    FROM sessions
)
SELECT CAST(MAX(n) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / MAX(n) AS bounce_rate,
       MAX(CASE WHEN i = CAST(FLOOR(0.50 * (n - 1)) AS BIGINT)
                THEN dwell_us END) AS p50_dwell_us,
       MAX(CASE WHEN i = CAST(FLOOR(0.90 * (n - 1)) AS BIGINT)
                THEN dwell_us END) AS p90_dwell_us
FROM dur
"""


@query("session_dwell_metrics", _DWELL_SQL)
def q_session_dwell_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product metrics ON TOP of sessionization: session count,
    bounce rate (single-event sessions), and exact p50/p90 dwell time
    — computed from the SAME sessionize_batch operator the driver
    checks directly, so this row re-validates the session semantics
    through a second, aggregated lens (its oracle embeds the full
    sessionization oracle as a subquery).

    Dwell percentiles use the repo's order-statistic convention
    (value at floor(p·(n-1)) of the sorted multiset — selection, no
    interpolation) on integer microsecond durations: deterministic
    regardless of tie order. Scale shape: the session frame is already
    the user-shuffled aggregate; the global order statistic runs on
    session-cardinality data (one single-partition window over an
    aggregated frame — the documented post-aggregate exception)."""
    sessions = sessionize_batch(load_table(spark, "events", sf_dir)).select(
        (
            F.unix_micros("session_end") - F.unix_micros("session_start")
        ).alias("dwell_us"),
        "n_events",
    )
    w = Window.orderBy("dwell_us")
    ranked = sessions.select(
        "dwell_us",
        "n_events",
        (F.row_number().over(w) - 1).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_sessions"),
        (
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("double")
            / F.max("n")
        ).alias("bounce_rate"),
        F.max(
            F.when(F.col("i") == F.floor(0.50 * (F.col("n") - 1)), F.col("dwell_us"))
        ).alias("p50_dwell_us"),
        F.max(
            F.when(F.col("i") == F.floor(0.90 * (F.col("n") - 1)), F.col("dwell_us"))
        ).alias("p90_dwell_us"),
    )


# --------------------------------------------------------------------------
# Dup-component size distribution (composed over connected components)
# --------------------------------------------------------------------------

_COMPONENT_DIST_SQL = f"""
WITH assigned AS ({_CLUSTERS_SQL}),
sizes AS (
    SELECT cluster_id, COUNT(*) AS cluster_size
    FROM assigned GROUP BY cluster_id
),
meta AS (
    SELECT CAST(MAX(cluster_size) AS DOUBLE) AS giant,
           CAST(SUM(cluster_size) AS DOUBLE) AS total
    FROM sizes
)
SELECT CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       m.giant / m.total AS giant_share
FROM sizes s CROSS JOIN meta m
GROUP BY s.cluster_size, m.giant, m.total
ORDER BY cluster_size
"""


@query("component_size_distribution", _COMPONENT_DIST_SQL)
def q_component_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup sanity check run BEFORE trusting any dedup pass: the
    cluster-size histogram of the near-dup connected components plus
    the giant-component share (largest component / corpus). A healthy
    near-dup graph is dominated by size-1..3 components; a large giant
    share means the similarity threshold or banding collapsed the
    corpus and the survivor step would delete real data. Composes the
    SAME clusters operator the driver checks directly (oracle embeds
    its oracle), re-validating component semantics through the
    histogram lens.

    Scale shape: sizes is a cluster-cardinality aggregate of the
    assignment; the histogram re-aggregates sizes (≤ max-size groups);
    giant/total ride along as a broadcast 1-row frame. Integer counts
    and a ratio of two exact integers — nothing to quantize. Candidate
    pairs come from the shared materialized MinHash table (the fourth
    consumer), so the audit never re-pays the signature+banding pass
    it is auditing."""
    from dieter___etl___monarchmoney_spark.operators.dedup import (
        neardup_clusters,
    )
    from dieter___etl___monarchmoney_spark.queries.llm_pipeline import (
        shared_minhash_pairs,
    )

    docs = load_table(spark, "documents", sf_dir)
    pairs = shared_minhash_pairs(spark, sf_dir)
    assigned = neardup_clusters(docs, pairs, "doc_id")
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    meta = sizes.agg(
        F.max("cluster_size").cast("double").alias("giant"),
        F.sum("cluster_size").cast("double").alias("total"),
    )
    return (
        sizes.crossJoin(F.broadcast(meta))
        .groupBy("cluster_size", "giant", "total")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "n_clusters",
            (F.col("giant") / F.col("total")).alias("giant_share"),
        )
        .orderBy("cluster_size")
    )
