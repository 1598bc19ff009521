"""Round-4 wave-7 operators: deterministic KMV set-similarity sketches,
CUSUM changepoint detection, day-of-week seasonal decomposition, and
per-source document-length band filtering.

Common thread: each is an operator a training-data / analytics platform
runs at corpus scale, expressed so the DISTRIBUTED plan is the obvious
one (per-key aggregates, bounded sketches, window functions over small
derived series) and the arithmetic is bit-deterministic across engines
(exact integer/decimal cores; doubles only for final, fixed-shape
expressions — the repo's oracle-parity discipline).

Reference framing: the reference engine (an API ETL client) has none of
these; they extend the repo's training-pipeline family (SURVEY.md §2
"beyond the reference" scope) alongside operators/dedup.py and
queries/corpus_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

# --------------------------------------------------------------------------
# KMV (k-minimum-values) set similarity between event-type audiences
# --------------------------------------------------------------------------

#: LCG constants (glibc): applied twice for mixing. 1103515245 * (2^31-1)
#: ≈ 2.4e18 < 2^63-1, so the arithmetic never overflows BIGINT in either
#: engine — overflow behavior is the classic cross-engine trap for
#: hash-sketch parity.
_KMV_A, _KMV_B, _KMV_M = 1103515245, 12345, 2147483648
_KMV_K = 128

_KMV_SQL = f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (
    SELECT DISTINCT event_type,
           (({_KMV_A} * (({_KMV_A} * user_id + {_KMV_B}) % {_KMV_M})
             + {_KMV_B}) % {_KMV_M}) AS h
    FROM du
),
sk AS (
    SELECT event_type, h FROM (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
        FROM h
    ) WHERE r <= {_KMV_K}
),
types AS (SELECT DISTINCT event_type FROM du),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b
    FROM types a JOIN types b ON a.event_type < b.event_type
),
merged AS (
    SELECT p.type_a, p.type_b, s.h,
           MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
           MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
    FROM pairs p
    JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
    GROUP BY p.type_a, p.type_b, s.h
),
ranked AS (
    SELECT type_a, type_b, in_a, in_b,
           ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS r,
           COUNT(*) OVER (PARTITION BY type_a, type_b) AS n_merged
    FROM merged
),
est AS (
    SELECT type_a, type_b,
           CAST(SUM(CASE WHEN r <= {_KMV_K} AND in_a = 1 AND in_b = 1
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(LEAST(MAX(n_merged), {_KMV_K}) AS DOUBLE) AS est_jaccard
    FROM ranked GROUP BY type_a, type_b
),
exact AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(CASE WHEN a.user_id = b.user_id THEN 1 END) AS BIGINT)
               AS n_inter
    FROM du a JOIN du b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
),
sizes AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY event_type)
SELECT e.type_a, e.type_b, est.est_jaccard,
       CAST(e.n_inter AS DOUBLE)
         / CAST(sa.n + sb.n - e.n_inter AS DOUBLE) AS exact_jaccard,
       e.n_inter, (sa.n + sb.n - e.n_inter) AS n_union
FROM exact e
JOIN est ON est.type_a = e.type_a AND est.type_b = e.type_b
JOIN sizes sa ON sa.event_type = e.type_a
JOIN sizes sb ON sb.event_type = e.type_b
ORDER BY e.type_a, e.type_b
"""


@query("kmv_set_similarity", _KMV_SQL)
def q_kmv_set_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) sketch Jaccard between the
    distinct-user audiences of every event-type pair, alongside the
    exact Jaccard — the distributed-systems workhorse for "how similar
    are these two huge sets" without materializing either (Beyer et al.,
    SIGMOD'07 "On synopses for distinct-value estimation").

    Determinism: the hash is an explicit two-round LCG over BIGINT —
    identical integer arithmetic in Spark and DuckDB (no engine hash()
    involved, no overflow) — so the sketch, and therefore the ESTIMATE
    itself, is bit-reproducible and oracle-checkable, not just
    approximately right.

    Scale shape: per-type sketches are a distinct + window-top-k whose
    state is ≤k rows per type (the window partitions by type — at 100 TB
    the distinct does the heavy shuffle and the sketch output is KB);
    everything after operates on #types·k rows on one node's worth of
    data. Exact Jaccard (the audit side) is the only fact-sized join —
    drop it in production and the sketch path alone remains."""
    events = load_table(spark, "events", sf_dir)
    du = events.select("event_type", "user_id").distinct()
    h1 = (F.lit(_KMV_A) * F.col("user_id") + F.lit(_KMV_B)) % F.lit(_KMV_M)
    h2 = (F.lit(_KMV_A) * h1 + F.lit(_KMV_B)) % F.lit(_KMV_M)
    hashed = du.select("event_type", h2.alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        hashed.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _KMV_K)
        .select("event_type", "h")
    )
    types = du.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    merged = (
        F.broadcast(pairs)
        .join(
            sk,
            (sk.event_type == F.col("type_a")) | (sk.event_type == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    wp = Window.partitionBy("type_a", "type_b").orderBy("h")
    wall = Window.partitionBy("type_a", "type_b")
    est = (
        merged.withColumn("r", F.row_number().over(wp))
        .withColumn("n_merged", F.count(F.lit(1)).over(wall))
        .groupBy("type_a", "type_b")
        .agg(
            (
                F.sum(
                    F.when(
                        (F.col("r") <= _KMV_K)
                        & (F.col("in_a") == 1)
                        & (F.col("in_b") == 1),
                        1,
                    ).otherwise(0)
                ).cast("double")
                / F.least(F.max("n_merged"), F.lit(_KMV_K)).cast("double")
            ).alias("est_jaccard")
        )
    )
    exact = (
        du.alias("x")
        .join(
            du.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        exact.join(est, ["type_a", "type_b"])
        .join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "est_jaccard",
            (
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double")
            ).alias("exact_jaccard"),
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------------
# CUSUM changepoint scan over the daily value series
# --------------------------------------------------------------------------

_CUSUM_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS v
    FROM events GROUP BY CAST(ts AS DATE)
),
tot AS (
    SELECT CAST(SUM(v) AS DECIMAL(38,6)) AS total,
           COUNT(*) AS n
    FROM daily
),
cum AS (
    SELECT d,
           CAST(SUM(v) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(38,6)) AS c,
           CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t
    FROM daily
)
SELECT d AS changepoint_date,
       CAST(CAST(n AS DECIMAL(38,6)) * c
            - CAST(t AS DECIMAL(38,6)) * total AS DOUBLE)
         / CAST(n AS DOUBLE) AS cusum
FROM cum, tot
ORDER BY ABS(CAST(CAST(n AS DECIMAL(38,6)) * c
                  - CAST(t AS DECIMAL(38,6)) * total AS DOUBLE)
             / CAST(n AS DOUBLE)) DESC, d
LIMIT 10
"""


@query("cusum_changepoint", _CUSUM_SQL)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan: for the daily event-value series, the
    cumulative sum of deviations from the global mean, S_t = Σ_{i≤t}
    (v_i − μ); the date maximizing |S_t| is the classic single-
    changepoint estimate (Page 1954 / binary-segmentation step 1). Top
    10 candidate dates by |S_t|.

    Determinism: the textbook form subtracts a MEAN — a division whose
    rounding would infect every partial sum. Rewritten scale-free as
    S_t = (n·C_t − t·Total)/n with C_t/Total exact DECIMAL(38,6) sums
    and n, t integers: the numerator is EXACT integer×decimal
    arithmetic in both engines, and the single double division per row
    is fixed-shape. DECIMAL(38,6) gives 32 integer digits — n·C_t at
    100 TB scale (n≈10⁴ days × 10¹³ total) still fits with 10 digits
    to spare.

    Scale shape: the fact collapses to one row per day in a map-side-
    combinable aggregate; the cumulative window runs over the
    day-cardinality series (thousands of rows — single partition by
    design, and correctly so: the series IS driver-scale). The top-10
    is a TakeOrderedAndProject with a date tie-break."""
    events = load_table(spark, "events", sf_dir)
    daily = (
        events.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("v")
        )
    )
    tot = daily.agg(
        F.sum("v").cast("decimal(38,6)").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.sum("v").over(wcum).cast("decimal(38,6)").alias("c"),
        F.row_number().over(Window.orderBy("d")).cast("long").alias("t"),
    )
    cusum = (
        F.col("n").cast("decimal(38,6)") * F.col("c")
        - F.col("t").cast("decimal(38,6)") * F.col("total")
    ).cast("double") / F.col("n").cast("double")
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(F.col("d").alias("changepoint_date"), cusum.alias("cusum"))
        .orderBy(F.abs(F.col("cusum")).desc(), "changepoint_date")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Day-of-week seasonal decomposition of the daily activity series
# --------------------------------------------------------------------------

_DOW_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events
    FROM events GROUP BY CAST(ts AS DATE)
),
keyed AS (
    SELECT d, n_events,
           (CAST(d AS DATE) - DATE '1970-01-01') % 7 AS dow
    FROM daily
),
season AS (
    SELECT dow,
           CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS dow_mean,
           COUNT(*) AS n_days
    FROM keyed GROUP BY dow
)
SELECT k.d, k.dow, k.n_events, s.dow_mean,
       CAST(k.n_events AS DOUBLE) - s.dow_mean AS residual
FROM keyed k JOIN season s ON s.dow = k.dow
ORDER BY ABS(CAST(k.n_events AS DOUBLE) - s.dow_mean) DESC, k.d
LIMIT 15
"""


@query("seasonal_dow_decompose", _DOW_SQL)
def q_seasonal_dow_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition: the daily event-count series
    split into a per-weekday baseline (the seasonal component) and a
    residual; the top-15 |residual| days are the calendar anomalies
    that survive weekday seasonality — the first honest step of any
    traffic-anomaly monitor (naive z-scores flag every weekend).

    Determinism: day-of-week is epoch-day mod 7 — pure integer
    arithmetic, immune to engine dayofweek()/locale conventions
    (Sunday=0 vs 1 vs 7). Counts are integers; the baseline is exact
    integer sum / count in one fixed-shape double division.

    Scale shape: fact → day-cardinality aggregate (map-side
    combinable); the seasonal join is 7 rows broadcast back onto the
    day series. Nothing fact-sized survives the first aggregate."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    keyed = daily.select(
        "d",
        "n_events",
        (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7)
        .cast("long")
        .alias("dow"),
    )
    season = keyed.groupBy("dow").agg(
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias("dow_mean"),
        F.count(F.lit(1)).alias("n_days"),
    )
    residual = F.col("n_events").cast("double") - F.col("dow_mean")
    return (
        keyed.join(F.broadcast(season.select("dow", "dow_mean")), "dow")
        .select("d", "dow", "n_events", "dow_mean", residual.alias("residual"))
        .orderBy(F.abs(residual).desc(), "d")
        .limit(15)
    )


# --------------------------------------------------------------------------
# Per-source document-length band filter (exact order-statistic cutoffs)
# --------------------------------------------------------------------------

_BAND_LO, _BAND_HI = 0.05, 0.95

_BAND_SQL = f"""
WITH ranked AS (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS r,
           COUNT(*) OVER (PARTITION BY source) AS n
    FROM documents
),
cuts AS (
    SELECT source,
           MAX(CASE WHEN r = CAST(FLOOR({_BAND_LO} * (n - 1)) AS BIGINT) + 1
                    THEN n_chars END) AS lo_chars,
           MAX(CASE WHEN r = CAST(FLOOR({_BAND_HI} * (n - 1)) AS BIGINT) + 1
                    THEN n_chars END) AS hi_chars
    FROM ranked GROUP BY source
)
SELECT d.source,
       COUNT(*) AS n_kept,
       CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars,
       c.lo_chars, c.hi_chars
FROM documents d JOIN cuts c ON c.source = d.source
WHERE d.n_chars >= c.lo_chars AND d.n_chars <= c.hi_chars
GROUP BY d.source, c.lo_chars, c.hi_chars
ORDER BY d.source
"""


@query("doc_length_band_filter", _BAND_SQL)
def q_doc_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length-band curation: keep documents whose character
    length falls inside the source's own [p5, p95] band — the standard
    "drop truncated fragments and concatenation blobs per domain" rule
    (C4/RefinedWeb-style length filtering, made source-relative so a
    code-heavy source isn't judged by a news source's lengths).

    Determinism: cutoffs are EXACT order statistics — the value at rank
    floor(q·(n−1))+1 under the total order (n_chars, doc_id) — not an
    interpolated percentile, so both engines pick the same concrete
    document's length as the threshold (interpolation formulas are the
    classic cross-engine divergence; rank selection cannot diverge).

    Scale shape (round 11, VERDICT r10 #1's class fix): the exact rank
    comes from the two-phase bucketed row_number (operators/rank.py —
    per-source percentile_approx edges, local ranks in |sources| x 32
    cells, broadcast offsets; the group size rides the same K-bounded
    cell-count table), replacing the per-source full-membership window
    whose single task was this query's own documented 100 TB cost.
    Cutoffs stay one row per source joined back as a broadcast; the
    filter+aggregate is one more scan."""
    from dieter___etl___monarchmoney_spark.operators.rank import exact_group_rank

    docs = load_table(spark, "documents", sf_dir).select(
        "source", "doc_id", "n_chars"
    )
    ranked = exact_group_rank(
        docs, ["source"], "n_chars", ["doc_id"], rank_col="r", n_col="n"
    ).select("source", "n_chars", "r", "n")
    lo_rank = F.floor(F.lit(_BAND_LO) * (F.col("n") - 1)).cast("long") + 1
    hi_rank = F.floor(F.lit(_BAND_HI) * (F.col("n") - 1)).cast("long") + 1
    cuts = ranked.groupBy("source").agg(
        F.max(F.when(F.col("r") == lo_rank, F.col("n_chars"))).alias("lo_chars"),
        F.max(F.when(F.col("r") == hi_rank, F.col("n_chars"))).alias("hi_chars"),
    )
    return (
        docs.join(F.broadcast(cuts), "source")
        .filter(
            (F.col("n_chars") >= F.col("lo_chars"))
            & (F.col("n_chars") <= F.col("hi_chars"))
        )
        .groupBy("source", "lo_chars", "hi_chars")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .select("source", "n_kept", "kept_chars", "lo_chars", "hi_chars")
        .orderBy("source")
    )
