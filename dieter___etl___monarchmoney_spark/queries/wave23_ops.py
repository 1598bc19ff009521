"""Round-4 wave 23: training-data quality closers —

- ``pit_training_features``: POINT-IN-TIME-correct feature assembly —
  each training example (a purchase) gets features computed from the
  user's history STRICTLY BEFORE the example's own timestamp (the
  window frame ends at -1 PRECEDING). Label leakage via
  current/future rows is the most common silent corruption in ML
  training sets; the frame bound makes non-leakage structural, and a
  unit test pins that an inclusive frame would change the output;
- ``knn_label_noise_audit``: confident-learning-lite — vectors whose
  k=5 nearest neighbors vote strongly for a DIFFERENT label are
  flagged as suspected mislabels, composing the exact batch-kNN
  machinery (knn_batch_join's two-phase salted top-k) into the label
  QA pass a curation pipeline runs before trusting labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.operators.similarity import dot
from dieter___etl___monarchmoney_spark.queries.llm_pipeline import _dot_sql
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

_DEC = "decimal(18,6)"


# --------------------------------------------------------------------------
# Point-in-time features (leakage-safe window frame)
# --------------------------------------------------------------------------

_PIT_SQL = """
WITH hist AS (
    SELECT user_id, ts, event_id, event_type, value,
           COUNT(*) OVER w AS prior_n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
               AS prior_total_value,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                OVER w AS BIGINT) AS prior_n_errors
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS example_id, user_id,
       epoch_us(CAST(ts AS TIMESTAMP)) AS label_ts_us,
       CAST(COALESCE(prior_n_events, 0) AS BIGINT) AS prior_n_events,
       COALESCE(prior_total_value, 0.0) AS prior_total_value,
       COALESCE(prior_n_errors, 0) AS prior_n_errors
FROM hist
WHERE event_type = 'purchase'
ORDER BY example_id
"""


@query("pit_training_features", _PIT_SQL)
def q_pit_training_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature assembly for training examples: every
    purchase gets the user's prior event count, prior total value, and
    prior error count computed over ROWS UNBOUNDED PRECEDING .. 1
    PRECEDING — the frame EXCLUDES the example row itself and
    everything after it, so no feature can see the label's timestamp
    or its future (the leakage class that silently inflates offline
    metrics). A user's first purchase gets all-zero features (COALESCE
    over the empty frame), which is itself the correct cold-start
    answer.

    Scale shape: ONE user_id shuffle serves every feature (they share
    the window); the frame is cumulative so state is O(1) per row —
    this is the batch twin of what a feature store's online path
    maintains incrementally, and the as-of union-scan
    (asof_last_signup) generalizes it to cross-table state. Feature
    sums quantize to decimals; timestamps leave as epoch micros."""
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.count(F.lit(1)).over(w).alias("pn"),
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("pv"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w)
        .cast("bigint")
        .alias("pe"),
    )
    return (
        hist.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("example_id"),
            "user_id",
            F.unix_micros("ts").alias("label_ts_us"),
            F.coalesce(F.col("pn"), F.lit(0)).cast("bigint").alias("prior_n_events"),
            F.coalesce(F.col("pv"), F.lit(0.0)).alias("prior_total_value"),
            F.coalesce(F.col("pe"), F.lit(0)).alias("prior_n_errors"),
        )
        .orderBy("example_id")
    )


# --------------------------------------------------------------------------
# kNN label-noise audit (confident-learning-lite)
# --------------------------------------------------------------------------

_NOISE_K = 5
_NOISE_MIN_VOTES = 3

_NOISE_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv, label AS own_label
    FROM embeddings WHERE vec_id % 25 = 0
),
scored AS (
    SELECT q.query_id, q.own_label, e.vec_id, e.label,
           {_dot_sql('e.embedding', 'q.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')})) AS similarity
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
),
topk AS (
    SELECT query_id, own_label, label FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY similarity DESC, vec_id
        ) AS rk FROM scored
    ) WHERE rk <= {_NOISE_K}
),
votes AS (
    SELECT query_id, own_label, label AS voted_label, COUNT(*) AS n_votes
    FROM topk GROUP BY query_id, own_label, label
),
modal AS (
    SELECT query_id, own_label, voted_label, n_votes FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY n_votes DESC, voted_label
        ) AS mrk FROM votes
    ) WHERE mrk = 1
)
SELECT query_id AS vec_id,
       CAST(own_label AS INT) AS own_label,
       CAST(voted_label AS INT) AS neighbor_label,
       CAST(n_votes AS INT) AS n_votes
FROM modal
WHERE voted_label <> own_label AND n_votes >= {_NOISE_MIN_VOTES}
ORDER BY vec_id
"""


@query("knn_label_noise_audit", _NOISE_SQL)
def q_knn_label_noise_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: for a deterministic 1-in-25 sample of
    vectors, the k={K} nearest neighbors (exact cosine) vote on the
    label; a vector whose modal neighbor label disagrees with its own
    AND reaches {V}+ votes is flagged as a suspected mislabel — the
    confident-learning-style QA pass run before a curation pipeline
    trusts labels for filtering or mixture weighting.

    Scale shape: the audited sample broadcasts as the query batch
    (identical shape to knn_batch_join, including the salted two-phase
    top-k that avoids the per-query reducer funnel); the vote and
    modal steps run on sample×k rows. At 100 TB the exact scorer
    swaps for the IVF/LSH paths (ann family) with the SAME vote/modal
    tail — the audit composes with whichever retrieval tier the scale
    affords. Ties in similarity break on vec_id; modal ties break on
    the smaller label — total orders on both engines."""
    vectors = load_table(spark, "embeddings", sf_dir)
    queries = vectors.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("own_label"),
    )
    scored = (
        vectors.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "own_label",
            "vec_id",
            "label",
            (
                dot(F.col("embedding"), F.col("qv"))
                / (
                    F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(dot(F.col("qv"), F.col("qv")))
                )
            ).alias("similarity"),
        )
        .withColumn("_salt", F.pmod(F.hash("vec_id"), F.lit(16)))
    )
    w1 = Window.partitionBy("query_id", "_salt").orderBy(
        F.col("similarity").desc(), "vec_id"
    )
    partial = scored.withColumn("_rn", F.row_number().over(w1)).filter(
        F.col("_rn") <= _NOISE_K
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("similarity").desc(), "vec_id")
    topk = (
        partial.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= _NOISE_K)
        .select("query_id", "own_label", "label")
    )
    votes = topk.groupBy("query_id", "own_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wm = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label")
    )
    modal = votes.withColumn("mrk", F.row_number().over(wm)).filter(
        F.col("mrk") == 1
    )
    return (
        modal.filter(
            (F.col("label") != F.col("own_label"))
            & (F.col("n_votes") >= _NOISE_MIN_VOTES)
        )
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("own_label").cast("int").alias("own_label"),
            F.col("label").cast("int").alias("neighbor_label"),
            F.col("n_votes").cast("int").alias("n_votes"),
        )
        .orderBy("vec_id")
    )
