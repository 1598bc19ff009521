"""Wave 30 (round 5): robust / distributional statistics over the
event stream and revenue fact — Theil-Sen robust trend (median of
pairwise slopes), Gini revenue concentration per nation, behavioral
path trigrams, inter-arrival burstiness, and a Kaplan-Meier churn
survival curve.

Determinism: integer/epoch-microsecond arithmetic wherever possible
(gap sums, rank products), DECIMAL quantization on money and on
|x|<1 log terms, unique tie-breaks on every ranking, and no in-query
ROUND on large-magnitude doubles (engine-divergent past the
significand — see SCALE.md wave-29 notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

# --------------------------------------------------------------------------
# Theil-Sen robust trend per event type
# --------------------------------------------------------------------------

_THEIL_SEN_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
    FROM events GROUP BY 1, 2, 3
),
slopes AS (
    SELECT a.event_type,
           (b.y - a.y) / (b.d - a.d) AS slope,
           a.d AS da, b.d AS db
    FROM daily a
    JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
),
ranked AS (
    SELECT event_type, slope,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY slope, da, db) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM slopes
)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
       ROUND(slope, 9) AS theil_sen_slope
FROM ranked
WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
ORDER BY event_type
"""


@query("theil_sen_trend", _THEIL_SEN_SQL)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of each event type's daily volume: the
    LOWER MEDIAN of all pairwise slopes — the estimator that shrugs
    off the outlier days that bend `event_trend_regression`'s OLS
    line. Median semantics are pinned as rank ⌈n/2⌉ under the unique
    (slope, day_a, day_b) order, so both engines pick the same pair
    even among equal slopes.

    Scale shape: the pairwise join runs on the DAILY AGGREGATE (days²
    per key, with day count bounded by the window — here 30 → 435
    pairs), never on raw events; keys parallelize. Daily sums
    quantize at DECIMAL(18,6) (2dp money contract), and the slope
    division is the same double op in both engines."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("y"))
    daily = daily.withColumn(
        "d", F.datediff("day", F.lit("2024-01-01").cast("date"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.d") - F.col("a.d"))).alias(
            "slope"
        ),
        F.col("a.d").alias("da"),
        F.col("b.d").alias("db"),
    )
    w = Window.partitionBy("event_type").orderBy("slope", "da", "db")
    wc = Window.partitionBy("event_type")
    return (
        slopes.select(
            "event_type",
            "slope",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .filter(F.col("rn") == F.ceil(F.col("n") / 2.0).cast("bigint"))
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_pairs"),
            F.round("slope", 9).alias("theil_sen_slope"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Gini revenue concentration per nation
# --------------------------------------------------------------------------

_GINI_SQL = """
WITH cust_rev AS (
    SELECT c.c_nationkey, o.o_custkey,
           SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS rev
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
),
ranked AS (
    SELECT c_nationkey, rev,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY rev, o_custkey) AS i
    FROM cust_rev
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(2 * SUM(i * rev) - (COUNT(*) + 1) * SUM(rev) AS DOUBLE)
             / (COUNT(*) * CAST(SUM(rev) AS DOUBLE)), 9) AS gini
FROM ranked
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@query("revenue_gini_by_nation", _GINI_SQL)
def q_revenue_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across each nation's
    ordering customers (0 = perfectly even, →1 = one whale) — the
    inequality panel of the reference's per-account cashflow shares,
    via the rank formula G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over
    ascending revenues.

    Everything before the final division is EXACT: revenues quantize
    at DECIMAL(18,6), ranks are integers from a unique (rev, custkey)
    order, and the rank-weighted sum stays decimal. The rank window
    partitions by nation; the input is the customer-grained aggregate
    (dimension×customer-sized), not the fact."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    cust_rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev"))
    )
    ranked = cust_rev.select(
        "c_nationkey",
        "rev",
        F.row_number()
        .over(Window.partitionBy("c_nationkey").orderBy("rev", "o_custkey"))
        .alias("i"),
    )
    n = F.count(F.lit(1))
    return (
        ranked.groupBy("c_nationkey")
        .agg(
            n.cast("bigint").alias("n_customers"),
            F.round(
                (
                    2 * F.sum(F.col("i") * F.col("rev"))
                    - (n + 1) * F.sum("rev")
                ).cast("double")
                / (n * F.sum("rev").cast("double")),
                9,
            ).alias("gini"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Behavioral path trigrams (3-step sequence mining)
# --------------------------------------------------------------------------

_PATH_TRIGRAM_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type, 1) OVER w AS t2,
           lead(event_type, 2) OVER w AS t3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || t2 || '>' || t3 AS path,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE t3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 20
"""


@query("event_path_trigrams", _PATH_TRIGRAM_SQL)
def q_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step behavioral paths across user event streams —
    the sequence-mining extension of `event_transition_matrix`
    (2-step): lead/lead2 windows per user, path counts, deterministic
    (count DESC, path) top-k. The window partitions by user (bounded
    per-user history — the 100 TB contract of the sessionization
    family); the aggregate is path-vocabulary-sized (≤ types³)."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Inter-arrival burstiness per user
# --------------------------------------------------------------------------

_BURSTINESS_SQL = """
WITH gaps AS (
    SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
),
stats AS (
    SELECT user_id,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS s1,
           SUM(CAST(gap_us AS DECIMAL(38,0)) * gap_us) AS s2
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id HAVING COUNT(gap_us) >= 2
)
SELECT user_id, n_gaps,
       CAST(s1 AS DOUBLE) / n_gaps / 1e6 AS mean_gap_s,
       ROUND(sqrt(CAST(n_gaps * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
                  / (CAST(n_gaps AS DOUBLE) * (n_gaps - 1)))
             / (CAST(s1 AS DOUBLE) / n_gaps), 9) AS cv
FROM stats ORDER BY user_id
"""


@query("interarrival_burstiness", _BURSTINESS_SQL)
def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coefficient of variation of inter-event gaps per user — the
    burstiness screen (CV ≈ 1 Poisson, ≫1 bursty, ≪1 metronomic)
    that complements `session_dwell_metrics`. Gaps are integer
    epoch-MICROSECONDS (the repo's timestamp-determinism contract),
    so n, Σx, Σx² are exact (x² routed through DECIMAL(38,0) — a
    30-day gap squared overflows BIGINT); only the final sample-std /
    mean division is floating. The lag window partitions per user;
    the mean emits raw (≈1e4-magnitude doubles never in-query-round)."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    stats = (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_us").cast("bigint").alias("n_gaps"),
            F.sum("gap_us").cast("bigint").alias("s1"),
            F.sum(F.col("gap_us").cast("decimal(38,0)") * F.col("gap_us")).alias(
                "s2"
            ),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    mean = F.col("s1").cast("double") / F.col("n_gaps") / F.lit(1e6)
    var_num = (
        F.col("n_gaps") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1")
    ).cast("double")
    std = F.sqrt(
        var_num / (F.col("n_gaps").cast("double") * (F.col("n_gaps") - 1))
    )
    return stats.select(
        "user_id",
        "n_gaps",
        mean.alias("mean_gap_s"),
        F.round(std / (F.col("s1").cast("double") / F.col("n_gaps")), 9).alias(
            "cv"
        ),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Kaplan-Meier churn survival curve
# --------------------------------------------------------------------------

_KM_SQL = """
WITH horizon AS (SELECT MAX(ts) AS h FROM events),
users AS (
    SELECT user_id,
           date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
               AS lifetime,
           CASE WHEN MAX(ts) < (SELECT h FROM horizon) - INTERVAL 7 DAY
                THEN 1 ELSE 0 END AS churned
    FROM events GROUP BY user_id
),
days AS (
    SELECT lifetime AS t,
           CAST(SUM(churned) AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS leaving
    FROM users GROUP BY lifetime
),
curve AS (
    SELECT t, d,
           CAST((SELECT COUNT(*) FROM users)
             - COALESCE(SUM(leaving) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS n_risk
    FROM days
)
SELECT t AS lifetime_days, n_risk, d AS d_churned,
       ROUND(CASE WHEN MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                      OVER (ORDER BY t) = 1
             THEN 0.0
             ELSE exp(CAST(SUM(CAST(
                      CASE WHEN d > 0 AND d < n_risk
                           THEN ln(1 - CAST(d AS DOUBLE) / n_risk)
                           ELSE 0.0 END AS DECIMAL(38,18)))
                  OVER (ORDER BY t) AS DOUBLE))
             END, 9) AS survival
FROM curve ORDER BY t
"""


@query("kaplan_meier_churn", _KM_SQL)
def q_kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes (days between
    first and last event): a user whose last event is >7 days before
    the stream horizon is a churn event at their lifetime; later users
    are right-censored. S(t) = Π(1 − dᵤ/nᵤ) over event days up to t —
    the survival analysis every retention team runs, distributed.

    Scale shape: one per-user aggregate (user-keyed, map-side
    combined) collapses the stream; every window after that runs over
    the LIFETIME-DAY table (bounded by the observation window, here ≤
    30 rows). The product is exp(Σ ln) with each |ln| term quantized
    to DECIMAL(38,18) (order-proof; transcendentals agree across
    engines), and the all-churned edge (1 − d/n = 0, where Spark's
    log yields NULL but DuckDB's yields −inf) is handled explicitly
    by a zero-survival flag window instead of relying on either
    engine's log-of-zero convention."""
    events = load_table(spark, "events", sf_dir)
    horizon = events.agg(F.max("ts").alias("h"))
    users = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff(
                F.to_date("last_ts"), F.to_date("first_ts")
            ).alias("lifetime"),
            F.when(
                F.col("last_ts") < F.col("h") - F.expr("INTERVAL 7 DAYS"), 1
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    n_total = users.agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
    days = (
        users.groupBy(F.col("lifetime").alias("t"))
        .agg(
            F.sum("churned").cast("bigint").alias("d"),
            F.count(F.lit(1)).cast("bigint").alias("leaving"),
        )
        .crossJoin(F.broadcast(n_total))
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t")
    curve = days.select(
        "t",
        "d",
        (
            F.col("nt")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    ln_term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.log(1 - F.col("d").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0)).cast("decimal(38,18)")
    dead_flag = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_cum)
    return curve.select(
        F.col("t").alias("lifetime_days"),
        "n_risk",
        F.col("d").alias("d_churned"),
        F.round(
            F.when(dead_flag == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum(ln_term).over(w_cum).cast("double"))
            ),
            9,
        ).alias("survival"),
    ).orderBy("lifetime_days")
