"""Wave 34 (round 5): closing completions — Kendall's tau (the
concordance twin of Spearman), error-burst islands (gaps-and-islands
on the time axis), duplicate-invoice pair detection (finance fraud
screen), and the scalable cumulative-distinct rewrite (first-seen
decomposition of COUNT(DISTINCT) OVER).

Determinism: concordance counts are pure integers; island bounds are
integer day indices; invoice pairs match on exact doubles and integer
keys; first-seen counts are integers end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

# --------------------------------------------------------------------------
# Kendall's tau between event-type daily series
# --------------------------------------------------------------------------

_KENDALL_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           SUM(CAST(value AS DECIMAL(18,6))) AS dval
    FROM events GROUP BY 1, 2
),
paired AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.day, a.dval AS xa, b.dval AS xb
    FROM daily a
    JOIN daily b ON a.day = b.day AND a.event_type < b.event_type
),
pp AS (
    SELECT p.type_a, p.type_b,
           CAST(SUM(CASE WHEN (q.xa - p.xa) * (q.xb - p.xb) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
           CAST(SUM(CASE WHEN (q.xa - p.xa) * (q.xb - p.xb) < 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM paired p
    JOIN paired q
      ON q.type_a = p.type_a AND q.type_b = p.type_b AND q.day > p.day
    GROUP BY 1, 2
)
SELECT type_a, type_b, concordant, discordant,
       ROUND(CAST(concordant - discordant AS DOUBLE) / n_pairs, 9)
           AS kendall_tau
FROM pp ORDER BY type_a, type_b
"""


@query("kendall_tau_daily", _KENDALL_SQL)
def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-a between every pair of event types' daily-volume
    series — the concordance-counting twin of
    `spearman_daily_correlation` (tau is the probability a random day
    pair moves the same way, minus the probability it moves
    opposite). Concordant/discordant counts are pure INTEGER
    comparisons of exact decimal daily sums, so the statistic has no
    floating accumulation at all until the final ratio.

    Scale shape: the day-pair join runs per (type_a, type_b) on the
    DAILY table — days² per type pair with day count bounded by the
    observation window, the same contract as `theil_sen_trend`; raw
    events are touched exactly once by the daily aggregate."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("dval")
    )
    a, b = daily.alias("a"), daily.alias("b")
    paired = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.day").alias("day"),
        F.col("a.dval").alias("xa"),
        F.col("b.dval").alias("xb"),
    )
    p, q = paired.alias("p"), paired.alias("q")
    sign = (F.col("q.xa") - F.col("p.xa")) * (F.col("q.xb") - F.col("p.xb"))
    pp = (
        p.join(
            q,
            (F.col("q.type_a") == F.col("p.type_a"))
            & (F.col("q.type_b") == F.col("p.type_b"))
            & (F.col("q.day") > F.col("p.day")),
        )
        .groupBy(
            F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b")
        )
        .agg(
            F.sum(F.when(sign > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("concordant"),
            F.sum(F.when(sign < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("discordant"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    return pp.select(
        "type_a",
        "type_b",
        "concordant",
        "discordant",
        F.round(
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.col("n_pairs"),
            9,
        ).alias("kendall_tau"),
    ).orderBy("type_a", "type_b")


# --------------------------------------------------------------------------
# Error-burst islands (gaps-and-islands on the time axis)
# --------------------------------------------------------------------------

_BURST_THRESHOLD = 0.21

_BURST_SQL = f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS err_rate
    FROM events GROUP BY 1, 2
),
flagged AS (
    SELECT d, err_rate,
           d - row_number() OVER (ORDER BY d) AS grp
    FROM daily WHERE err_rate > {_BURST_THRESHOLD}
)
SELECT CAST(MIN(d) AS BIGINT) AS start_day,
       CAST(MAX(d) AS BIGINT) AS end_day,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(MAX(err_rate), 9) AS peak_err_rate
FROM flagged GROUP BY grp
ORDER BY start_day
"""


@query("error_burst_islands", _BURST_SQL)
def q_error_burst_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous runs of elevated-error days (rate > {t}) as
    gaps-and-islands over the time axis — the incident-window
    detector: `d − row_number()` is constant within each consecutive
    run, so one window + one aggregate turns a daily flag into
    (start, end, length, peak) incident rows. Same island idiom as
    `max_duplicated_span`, applied to operations instead of text.

    The fact collapses to the day-grained aggregate first (one pass,
    map-side combined); every window after that runs over ≤
    observation-window rows. Error rates are exact integer-count
    ratios.""".format(t=_BURST_THRESHOLD)
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        F.to_date("ts").alias("day"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("d"),
    ).agg(
        (
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("err_rate")
    )
    flagged = daily.filter(F.col("err_rate") > _BURST_THRESHOLD).select(
        "d",
        "err_rate",
        (F.col("d") - F.row_number().over(Window.orderBy("d"))).alias("grp"),
    )
    return (
        flagged.groupBy("grp")
        .agg(
            F.min("d").cast("bigint").alias("start_day"),
            F.max("d").cast("bigint").alias("end_day"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.max("err_rate"), 9).alias("peak_err_rate"),
        )
        .drop("grp")
        .orderBy("start_day")
    )


# --------------------------------------------------------------------------
# Duplicate-invoice pair detection
# --------------------------------------------------------------------------

_DUP_INVOICE_DAYS = 7

#: deterministic "double-submitted batch": every 199th order re-enters
#: the stream two days later under a shifted key — the same
#: corrupted-replica drill style as fk_integrity_audit, so the screen
#: has true positives to certify on honest synthetic data.
_DUP_INVOICE_SQL = f"""
WITH submitted AS (
    SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate FROM orders
    UNION ALL
    SELECT o_custkey, o_orderkey + 100000000,
           o_totalprice, o_orderdate + INTERVAL 2 DAY
    FROM orders WHERE o_orderkey % 199 = 0
)
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS order_a, b.o_orderkey AS order_b,
       a.o_totalprice AS amount,
       CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
           AS days_apart
FROM submitted a
JOIN submitted b
  ON a.o_custkey = b.o_custkey
 AND a.o_totalprice = b.o_totalprice
 AND a.o_orderkey < b.o_orderkey
 AND b.o_orderdate >= a.o_orderdate - INTERVAL {_DUP_INVOICE_DAYS} DAY
 AND b.o_orderdate <= a.o_orderdate + INTERVAL {_DUP_INVOICE_DAYS} DAY
ORDER BY custkey, order_a, order_b
"""


@query("duplicate_invoice_pairs", _DUP_INVOICE_SQL)
def q_duplicate_invoice_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: pairs of orders by the SAME customer
    for the IDENTICAL total within ±{d} days — the classic
    accounts-payable audit (double-submitted invoices), the
    finance-flavored sibling of the exact-dedup family.

    Scale shape: the self-join keys on (customer, amount) — both
    equality predicates reach the shuffle key, so candidate pairs are
    Σ per-(customer, amount) group² (near-zero for honest data),
    never customer-group². The date window is a residual filter;
    exact double equality on the amount is deliberate (a duplicate
    SUBMISSION is bit-identical; near-miss amounts are
    `fuzzy_entity_resolution`'s territory). The input unions a
    deterministic resubmitted batch (every 199th order, +2 days,
    shifted key) so the screen certifies on true positives.""".format(
        d=_DUP_INVOICE_DAYS
    )
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    resub = o.filter(F.col("o_orderkey") % 199 == 0).select(
        "o_custkey",
        (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
        "o_totalprice",
        F.date_add("o_orderdate", 2).alias("o_orderdate"),
    )
    submitted = o.unionByName(resub)
    a, b = submitted.alias("a"), submitted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_totalprice") == F.col("b.o_totalprice"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (
                F.col("b.o_orderdate")
                >= F.col("a.o_orderdate") - F.expr(f"INTERVAL {_DUP_INVOICE_DAYS} DAYS")
            )
            & (
                F.col("b.o_orderdate")
                <= F.col("a.o_orderdate") + F.expr(f"INTERVAL {_DUP_INVOICE_DAYS} DAYS")
            ),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("order_a"),
            F.col("b.o_orderkey").alias("order_b"),
            F.col("a.o_totalprice").alias("amount"),
            F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate"))
            .cast("bigint")
            .alias("days_apart"),
        )
        .orderBy("custkey", "order_a", "order_b")
    )


# --------------------------------------------------------------------------
# Cumulative distinct users via first-seen decomposition
# --------------------------------------------------------------------------

_CUMDIST_SQL = """
WITH first_seen AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
),
new_per_day AS (
    SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
    FROM first_seen GROUP BY day
),
all_days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT d.day, COALESCE(n.new_users, 0) AS new_users,
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day) AS BIGINT)
           AS cumulative_distinct_users
FROM all_days d LEFT JOIN new_per_day n USING (day)
ORDER BY d.day
"""


@query("cumulative_distinct_users", _CUMDIST_SQL)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of distinct users ever seen, per day — the
    COUNT(DISTINCT) OVER (ORDER BY day) that engines either refuse or
    execute by re-scanning an ever-growing set per row, rewritten as
    the scalable FIRST-SEEN decomposition: each user contributes a
    single (user → first day) row, new-user counts aggregate per day,
    and the cumulative sum runs over the day-grained table. One
    user-keyed aggregate over the fact; every window touches ≤
    observation-window rows. The growth-curve companion of
    `rolling_distinct_users_7d` (whose window slides instead of
    accumulating) and `weekly_retention_cohorts`."""
    events = load_table(spark, "events", sf_dir)
    first_seen = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    new_per_day = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    all_days = events.select(F.to_date("ts").alias("day")).distinct()
    return (
        all_days.join(new_per_day, "day", "left")
        .select("day", F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"))
        .withColumn(
            "cumulative_distinct_users",
            F.sum("new_users").over(Window.orderBy("day")).cast("bigint"),
        )
        .orderBy("day")
    )
