"""Round-4 wave-9: temporal-join and function-surface operators —
fact-to-SCD2 interval join, conversion-lag quantiles, and the map/array
higher-order-function surface.

Reference framing: the reference engine joins each transaction to the
CURRENT category/account dimension row (type-1 thinking); the SCD2 join
here is what that enrichment becomes once dimensions keep history —
each fact row must match the dimension version VALID AT ITS EVENT TIME,
the canonical warehouse temporal join. The HOF surface pins the §2.8
scalar-function family's array/map corner (the reference scalarizes
nested payloads to JSON; a Spark-native engine exposes the collection
algebra directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

# --------------------------------------------------------------------------
# Fact → SCD2 dimension interval join (match the version valid at event time)
# --------------------------------------------------------------------------

_SCD2_JOIN_SQL = """
WITH purchases AS (
    SELECT event_id, user_id, ts
    FROM events WHERE event_type = 'purchase'
),
dim AS (
    SELECT user_id, value AS profile_value, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
    FROM events WHERE event_type = 'signup'
)
SELECT p.event_id, p.user_id,
       CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       d.profile_value,
       CAST(d.valid_from AS TIMESTAMP) AS valid_from
FROM purchases p
JOIN dim d
  ON d.user_id = p.user_id
 AND p.ts >= d.valid_from
 AND (d.valid_to IS NULL OR p.ts < d.valid_to)
ORDER BY p.event_id
"""


@query("scd2_temporal_join", _SCD2_JOIN_SQL)
def q_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-to-SCD2 temporal join: each purchase matches the signup
    profile version whose [valid_from, valid_to) interval contains the
    purchase time — the canonical "enrich with the dimension AS OF the
    event" warehouse join (Kimball type-2 lookup). Signups play the
    versioned dimension (valid_to = next signup per user, open-ended
    current row); purchases are the fact.

    Semantics note vs the as-of join (operators/asof.py): as-of picks
    the LATEST version ≤ ts even when versions are sparse; the SCD2
    join is stricter — a fact BEFORE the first version matches nothing
    (no row), exactly the referential behavior a versioned dimension
    contracts. Both matter; they differ precisely on early facts.

    Scale shape: version intervals per user come from one LEAD window
    over the (small) dimension slice; the interval predicate rides an
    EQUI-join on user_id — Spark plans hash/sort-merge on the key and
    evaluates the range residually per key group (never a cross
    product; versions-per-user is bounded). At 100 TB the dim side is
    dimension-sized → broadcast; the fact never shuffles at all."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("d_user_id"),
            F.col("value").alias("profile_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    return (
        purchases.join(
            F.broadcast(dim),
            (F.col("user_id") == F.col("d_user_id"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        )
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "profile_value",
            "valid_from",
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Conversion-lag quantiles (first view → first purchase, exact order stats)
# --------------------------------------------------------------------------

_LAG_QUANTS = (0.5, 0.9, 0.99)

_CONVLAG_SQL = f"""
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
    FROM events GROUP BY user_id
),
lags AS (
    SELECT user_id,
           CAST(epoch_us(CAST(first_purchase AS TIMESTAMP))
                - epoch_us(CAST(first_view AS TIMESTAMP)) AS BIGINT)
               AS lag_us
    FROM firsts
    WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
      AND first_purchase >= first_view
),
ranked AS (
    SELECT lag_us,
           ROW_NUMBER() OVER (ORDER BY lag_us, user_id) AS r,
           COUNT(*) OVER () AS n
    FROM lags
)
SELECT {", ".join(
    f"MAX(CASE WHEN r = CAST(FLOOR({q} * (n - 1)) AS BIGINT) + 1 "
    f"THEN lag_us END) AS p{int(q * 100)}_lag_us"
    for q in _LAG_QUANTS
)},
       COUNT(*) AS n_converted
FROM ranked
"""


@query("conversion_lag_quantiles", _CONVLAG_SQL)
def q_conversion_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, the lag from FIRST view
    to FIRST purchase; output the p50/p90/p99 of that lag as exact
    order statistics (rank floor(q·(n−1))+1 under the (lag, user_id)
    total order — the doc_length_band_filter discipline: rank
    selection, never interpolation, so both engines pick the same
    concrete user's lag).

    Scale shape: firsts is ONE map-side-combinable conditional-MIN
    aggregate over the fact (user-cardinality output); lags are pure
    row arithmetic in epoch micros (no timestamp subtraction semantics
    in play); the rank window orders user-cardinality rows — at 100 TB
    swap in approx_percentile over lag_us, same plan shape. The single
    global window is correct here: the lag table IS the small derived
    series, not the fact."""
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    lags = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        "user_id",
        (
            F.unix_micros("first_purchase") - F.unix_micros("first_view")
        ).alias("lag_us"),
    )
    ranked = lags.select(
        "lag_us",
        F.row_number().over(Window.orderBy("lag_us", "user_id")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("r")
                == F.floor(F.lit(q) * (F.col("n") - 1)).cast("long") + 1,
                F.col("lag_us"),
            )
        ).alias(f"p{int(q * 100)}_lag_us")
        for q in _LAG_QUANTS
    ]
    return ranked.agg(*aggs, F.count(F.lit(1)).alias("n_converted"))


# --------------------------------------------------------------------------
# Array/map higher-order-function surface (§2.8's collection corner)
# --------------------------------------------------------------------------

_HOF_SQL = """
WITH per_order AS (
    SELECT l_orderkey,
           list_sort(list(l_quantity ORDER BY l_linenumber)) AS qtys_sorted,
           list(l_quantity ORDER BY l_linenumber) AS qtys
    FROM lineitem
    GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(qtys) AS n_lines,
       list_reduce(list_prepend(CAST(0 AS DOUBLE), qtys),
                   (acc, x) -> acc + x) AS total_qty,
       qtys_sorted[1] AS min_qty,
       qtys_sorted[len(qtys_sorted)] AS max_qty,
       len(list_filter(qtys, x -> x >= 25.0)) AS n_bulk_lines,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                list_transform(qtys, x -> x * x)),
                   (acc, x) -> acc + x) AS sumsq_qty
FROM per_order
ORDER BY l_orderkey
LIMIT 1000
"""


@query("order_lines_hof_profile", _HOF_SQL)
def q_order_lines_hof_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The collection-algebra surface (§2.8's array/map corner) as one
    registered query: per order, the line quantities are collected into
    an array IN LINE-NUMBER ORDER and every downstream statistic is a
    higher-order function over that array — transform (map), filter,
    aggregate (left fold), array_sort + element_at (order stats). The
    fold order is pinned by the collected order, so the double sums are
    engine-identical left folds (the _dot_sql discipline from the ANN
    family applied to the relational star).

    Scale shape: ONE shuffle (the per-order collect); every HOF then
    runs element-at-a-time inside the row — no further shuffles, no
    explode-back. This is the pattern that replaces "explode, window,
    re-aggregate" chains when the per-key payload is bounded (line
    counts are ≤7 here; guard collect_list payloads at scale). Top-1000
    by key is TakeOrderedAndProject."""
    li = load_table(spark, "lineitem", sf_dir)
    qtys = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("l_linenumber"), F.col("l_quantity")))
        ),
        lambda s: s["l_quantity"],
    )
    per_order = li.groupBy("l_orderkey").agg(qtys.alias("qtys"))
    zero = F.lit(0.0).cast("double")
    fold_sum = F.aggregate(F.col("qtys"), zero, lambda acc, x: acc + x)
    fold_sumsq = F.aggregate(
        F.transform(F.col("qtys"), lambda x: x * x),
        zero,
        lambda acc, x: acc + x,
    )
    qs = F.array_sort(F.col("qtys"))
    return (
        per_order.select(
            "l_orderkey",
            F.size("qtys").alias("n_lines"),
            fold_sum.alias("total_qty"),
            F.element_at(qs, 1).alias("min_qty"),
            F.element_at(qs, -1).alias("max_qty"),
            F.size(F.filter(F.col("qtys"), lambda x: x >= 25.0)).alias(
                "n_bulk_lines"
            ),
            fold_sumsq.alias("sumsq_qty"),
        )
        .orderBy("l_orderkey")
        .limit(1000)
    )
