"""Wave 29 (round 5): the classify/forecast/report/attribute block —
a naive-Bayes language classifier with confusion matrix (the
train-and-score shape entirely in aggregates), Holt linear
exponential smoothing as an order-pinned array fold, top-N-plus-OTHER
reporting rollup, hierarchical revenue shares, and linear multi-touch
conversion attribution over a user-keyed range join.

Determinism: log/credit terms quantize to DECIMAL(38,18) and
money-magnitude values to DECIMAL(18,6) before summation (Spark casts
a double to decimal via its shortest decimal repr, DuckDB via the
exact binary expansion — identical only when the target scale is
coarser than the repr, hence 18,6 for 2dp money); every fold is left-to-right over a sorted array with the
identical op sequence in both engines; every ranking has a unique
tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

_FTOKS_SQL = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')"

# --------------------------------------------------------------------------
# Naive-Bayes language classifier + confusion matrix
# --------------------------------------------------------------------------

_NB_SQL = rf"""
WITH words AS (
    SELECT doc_id, lang, unnest({_FTOKS_SQL}) AS word FROM documents
),
dwc AS (
    SELECT doc_id, lang AS true_lang, word, CAST(COUNT(*) AS BIGINT) AS c_dw
    FROM words GROUP BY 1, 2, 3
),
lw AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c_lw FROM words GROUP BY 1, 2),
lt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l FROM words GROUP BY 1),
vocab AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v FROM words),
ld AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
scored AS (
    SELECT d.doc_id, d.true_lang, lt.lang AS cand,
           CAST(SUM(CAST(d.c_dw * ln(
                    CAST(COALESCE(lw.c_lw, 0) + 1 AS DOUBLE)
                    / (lt.n_l + vocab.v)) AS DECIMAL(38,18))) AS DOUBLE)
           + ln(CAST(ld.n_docs AS DOUBLE) / tot.n_total) AS score
    FROM dwc d
    CROSS JOIN lt
    CROSS JOIN vocab
    JOIN ld ON ld.lang = lt.lang
    CROSS JOIN tot
    LEFT JOIN lw ON lw.lang = lt.lang AND lw.word = d.word
    GROUP BY d.doc_id, d.true_lang, lt.lang, ld.n_docs, tot.n_total
),
pred AS (
    SELECT doc_id, true_lang, cand AS pred_lang
    FROM (
        SELECT doc_id, true_lang, cand,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand) AS rn
        FROM scored
    ) WHERE rn = 1
)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("naive_bayes_lang_confusion", _NB_SQL)
def q_naive_bayes_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes trained on the documents table (add-1
    smoothing, log-space) and resubstitution-scored, reported as a
    (true language, predicted language) confusion matrix — the
    classical supervised check of the heuristic `text_language_id`.

    The entire train+score loop is aggregates and joins: per-(lang,
    word) counts are the model (vocabulary-sized), scoring joins each
    document's (word, count) vector against all |langs| candidate
    rows (a dimension-sized cross), and each log-likelihood term
    quantizes to DECIMAL(38,18) before the per-(doc, candidate) sum —
    so the argmax is order-proof and the oracle reproduces it exactly
    (transcendentals agree bit-for-bit between engines per the
    determinism contract). No per-row UDF, no driver-side model
    object — at 100 TB the model stays a broadcast table."""
    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_remove(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), "")
        ).alias("word"),
    )
    dwc = words.groupBy(
        "doc_id", F.col("lang").alias("true_lang"), "word"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c_dw"))
    lw = words.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_lw")
    )
    lt = words.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_l"))
    vocab = words.agg(F.countDistinct("word").cast("bigint").alias("v"))
    ld = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    cand = (
        lt.join(ld, "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(tot))
        .select(F.col("lang").alias("cand"), "n_l", "n_docs", "v", "n_total")
    )
    pairs = dwc.crossJoin(F.broadcast(cand)).join(
        lw.select(
            F.col("lang").alias("cand"), F.col("word"), F.col("c_lw")
        ),
        ["cand", "word"],
        "left",
    )
    term = (
        F.col("c_dw")
        * F.log(
            (F.coalesce(F.col("c_lw"), F.lit(0)) + 1).cast("double")
            / (F.col("n_l") + F.col("v"))
        )
    ).cast("decimal(38,18)")
    scored = pairs.groupBy(
        "doc_id", "true_lang", "cand", "n_docs", "n_total"
    ).agg(
        (
            F.sum(term).cast("double")
            + F.log(F.col("n_docs").cast("double") / F.col("n_total"))
        ).alias("score")
    )
    pred = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("score").desc(), F.col("cand")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("cand").alias("pred_lang"))
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# Holt linear (double-exponential) smoothing as an order-pinned fold
# --------------------------------------------------------------------------

_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3

_HOLT_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
    FROM events GROUP BY 1, 2
),
ser AS (
    SELECT event_type, list(y ORDER BY day) AS ys FROM daily GROUP BY 1
),
folded AS (
    -- accumulator is a 2-element [level, trend] LIST, not a struct:
    -- DuckDB 1.0's list_reduce evaluates struct_pack fields against a
    -- sequentially-mutated accumulator (field b's expression sees the
    -- already-updated l), silently corrupting the recurrence; list
    -- literals evaluate their elements against the unmutated acc.
    SELECT event_type,
           list_reduce(
               list_transform(ys, y -> [CAST(y AS DOUBLE), CAST(0.0 AS DOUBLE)]),
               (acc, e) -> [
                   {_HOLT_ALPHA} * e[1]
                        + {1 - _HOLT_ALPHA} * (acc[1] + acc[2]),
                   {_HOLT_BETA} * (({_HOLT_ALPHA} * e[1]
                        + {1 - _HOLT_ALPHA} * (acc[1] + acc[2])) - acc[1])
                        + {1 - _HOLT_BETA} * acc[2]]) AS st
    FROM ser
)
SELECT event_type,
       ROUND(st[1], 9) AS level_final,
       ROUND(st[2], 9) AS trend_final,
       ROUND(st[1] + 7 * st[2], 9) AS forecast_7d
FROM folded ORDER BY event_type
"""


@query("holt_linear_forecast", _HOLT_SQL)
def q_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing over each event
    type's daily-volume series, with a 7-step-ahead forecast — the
    trend-aware sibling of `ewma_smoothing` (level only) and
    `seasonal_naive_backtest`. Semantics: l₁=y₁, b₁=0, then
    l=αy+(1−α)(l+b), b=β(l−l_prev)+(1−β)b with α={a}, β={b}.

    The recurrence is inherently sequential IN TIME but the series is
    per-key and day-grained — so each key's 30-point array folds in
    one task (array_sort + F.aggregate left fold), while keys
    parallelize. That is the 100 TB shape: millions of series, each
    tiny. Both engines run the IDENTICAL op sequence (the l-update
    expression inlined twice, same literal order), so the fold is
    bit-reproducible; daily inputs route through DECIMAL sums
    first.""".format(a=_HOLT_ALPHA, b=_HOLT_BETA)
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("y")
    )
    ser = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("arr")
    )
    ys = F.transform(F.col("arr"), lambda s: s["y"])
    a, na = F.lit(_HOLT_ALPHA), F.lit(1 - _HOLT_ALPHA)
    b, nb = F.lit(_HOLT_BETA), F.lit(1 - _HOLT_BETA)

    def step(acc, y):
        l_new = a * y + na * (acc["l"] + acc["b"])
        l_new2 = a * y + na * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (b * (l_new2 - acc["l"]) + nb * acc["b"]).alias("b"),
        )

    init = F.struct(
        F.element_at(ys, 1).alias("l"), F.lit(0.0).alias("b")
    )
    folded = F.when(
        F.size(ys) > 1,
        F.aggregate(F.slice(ys, 2, F.size(ys) - 1), init, step),
    ).otherwise(init)
    return (
        ser.select("event_type", folded.alias("st"))
        .select(
            "event_type",
            F.round(F.col("st")["l"], 9).alias("level_final"),
            F.round(F.col("st")["b"], 9).alias("trend_final"),
            F.round(F.col("st")["l"] + 7 * F.col("st")["b"], 9).alias(
                "forecast_7d"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Top-N + OTHER reporting rollup
# --------------------------------------------------------------------------

_TOPN_OTHERS_SQL = """
WITH ranked AS (
    SELECT c_nationkey, c_custkey, c_acctbal,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS rk
    FROM customer
)
SELECT c_nationkey, CAST(c_custkey AS VARCHAR) AS member,
       ROUND(c_acctbal, 9) AS balance, CAST(rk AS BIGINT) AS rnk
FROM ranked WHERE rk <= 3
UNION ALL
SELECT c_nationkey, 'OTHER' AS member,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 9)
           AS balance,
       CAST(4 AS BIGINT) AS rnk
FROM ranked WHERE rk > 3 GROUP BY c_nationkey
ORDER BY c_nationkey, rnk, member
"""


@query("topn_with_others_rollup", _TOPN_OTHERS_SQL)
def q_topn_with_others_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard reporting rollup: each nation's top-3 customers by
    balance as individual rows plus one OTHER row aggregating the
    rest — the shape every dashboard's 'top N + other' pie/limit view
    needs, here as one window + one conditional aggregate.

    The rank window partitions by nation (never global); the OTHER
    aggregate quantizes balances to DECIMAL before summing so the
    long-tail sum is order-exact. At scale the same plan holds: the
    window shuffles once on the group key and the OTHER branch is a
    partial-agg of the same shuffled pass."""
    ranked = load_table(spark, "customer", sf_dir).select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.row_number()
        .over(
            Window.partitionBy("c_nationkey").orderBy(
                F.col("c_acctbal").desc(), F.col("c_custkey")
            )
        )
        .alias("rk"),
    )
    top = ranked.filter(F.col("rk") <= 3).select(
        "c_nationkey",
        F.col("c_custkey").cast("string").alias("member"),
        F.round("c_acctbal", 9).alias("balance"),
        F.col("rk").cast("bigint").alias("rnk"),
    )
    others = (
        ranked.filter(F.col("rk") > 3)
        .groupBy("c_nationkey")
        .agg(
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 9
            ).alias("balance")
        )
        .select(
            "c_nationkey",
            F.lit("OTHER").alias("member"),
            "balance",
            F.lit(4).cast("bigint").alias("rnk"),
        )
    )
    return top.unionByName(others).orderBy("c_nationkey", "rnk", "member")


# --------------------------------------------------------------------------
# Hierarchical share-of-parent revenue report
# --------------------------------------------------------------------------

_HIERARCHY_SQL = """
WITH nat_rev AS (
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS nation_rev
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2
)
SELECT region_name, nation_name,
       nation_rev,
       ROUND(nation_rev / SUM(nation_rev)
                 OVER (PARTITION BY region_name), 9) AS share_of_region,
       ROUND(nation_rev / SUM(nation_rev) OVER (), 9) AS share_of_total
FROM nat_rev ORDER BY region_name, nation_name
"""


@query("hierarchy_share_report", _HIERARCHY_SQL)
def q_hierarchy_share_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent roll-up across the region → nation hierarchy:
    each nation's revenue, its share of its region, and its share of
    the total. The share windows run over the 25-row AGGREGATE (a
    dimension-sized frame — the one place an unpartitioned window is
    legitimate, because its input can never be data-sized); the only
    fact-sized work is the one revenue aggregate behind broadcast dim
    joins, DECIMAL-pooled so the shares are order-exact."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    nat_rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("nr")
        )
    )
    w_region = Window.partitionBy("region_name")
    w_all = Window.partitionBy()
    # no in-query ROUND on the 1e8-magnitude revenue: rounding a double
    # at 9 fractional digits past its significand is engine-divergent
    # (multiply-round-divide precision differs); the harness's uniform
    # 9dp normalization handles display instead. Shares are ≤1, safe.
    return nat_rev.select(
        "region_name",
        "nation_name",
        F.col("nr").alias("nation_rev"),
        F.round(F.col("nr") / F.sum("nr").over(w_region), 9).alias(
            "share_of_region"
        ),
        F.round(F.col("nr") / F.sum("nr").over(w_all), 9).alias("share_of_total"),
    ).orderBy("region_name", "nation_name")


# --------------------------------------------------------------------------
# Linear multi-touch conversion attribution
# --------------------------------------------------------------------------

_ATTRIB_SQL = """
WITH p AS (
    SELECT event_id AS p_id, user_id, ts AS p_ts
    FROM events WHERE event_type = 'purchase'
),
j AS (
    SELECT p.p_id, t.event_type AS channel
    FROM p
    LEFT JOIN events t
      ON t.user_id = p.user_id
     AND t.event_type IN ('view', 'click')
     AND t.ts <= p.p_ts
     AND t.ts > p.p_ts - INTERVAL 7 DAY
),
credited AS (
    SELECT COALESCE(channel, 'direct') AS channel,
           CAST(CASE WHEN channel IS NULL THEN 1.0
                ELSE 1.0 / (COUNT(channel) OVER (PARTITION BY p_id))
                END AS DECIMAL(38,18)) AS credit
    FROM j
)
SELECT channel,
       ROUND(CAST(SUM(credit) AS DOUBLE), 9) AS attributed_conversions,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM credited GROUP BY channel ORDER BY channel
"""


@query("linear_touch_attribution", _ATTRIB_SQL)
def q_linear_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase distributes one
    unit of conversion credit equally across the user's view/click
    touches in the preceding 7 days; purchases with no touches credit
    a 'direct' channel. The classic marketing-analytics operator the
    reference's cashflow attribution is a special case of.

    Scale shape: the touch join is user-keyed equi + time-range
    residual (per-user event counts are bounded, so fan-out is
    per-user² at worst, never cross-user); the per-purchase touch
    count is a window over the join result partitioned by purchase
    id. Credits (1/n, exact doubles) quantize to DECIMAL(38,18)
    before the channel sum, so attribution totals are
    aggregation-order-proof."""
    events = load_table(spark, "events", sf_dir)
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    t = events.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        "left",
    ).select("p_id", "channel")
    wcnt = Window.partitionBy("p_id")
    credited = j.select(
        F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"),
        F.when(F.col("channel").isNull(), F.lit(1.0))
        .otherwise(F.lit(1.0) / F.count("channel").over(wcnt))
        .cast("decimal(38,18)")
        .alias("credit"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.round(F.sum("credit").cast("double"), 9).alias(
                "attributed_conversions"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        )
        .orderBy("channel")
    )
