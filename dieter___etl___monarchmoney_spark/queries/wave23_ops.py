"""Round-4 wave 23: training-data quality closers —

- ``pit_training_features``: POINT-IN-TIME-correct feature assembly —
  each training example (a purchase) gets features computed from the
  user's history STRICTLY BEFORE the example's own timestamp (the
  window frame ends at -1 PRECEDING). Label leakage via
  current/future rows is the most common silent corruption in ML
  training sets; the frame bound makes non-leakage structural, and a
  unit test pins that an inclusive frame would change the output;
- ``knn_label_noise_audit``: confident-learning-lite — each audited
  vector's k=5 nearest neighbors (retrieved from its LSH multiprobe
  neighborhood — an equi-join on the bucket id, never a nested-loop
  product) vote on the label; a strong disagreeing majority marks the
  row ``suspect``, composing the ANN retrieval tier with the salted
  two-phase top-k into the label QA pass a curation pipeline runs
  before trusting labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.operators.similarity import dot, lsh_signature
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
# kNN label-noise audit (confident-learning-lite, LSH-blocked retrieval)
# --------------------------------------------------------------------------

_NOISE_K = 5
_NOISE_MIN_VOTES = 3
_NOISE_BITS = 8  # LSH signature width for the candidate neighborhood
_NOISE_RADIUS = 2  # multiprobe hamming radius
#: bounded audit batch: the FIRST 100 sample stripes (vec_id % 25 == 0
#: and vec_id < 2500). A QA pass audits a fixed-size batch, so total
#: work is batch × neighborhood — LINEAR in corpus size — instead of
#: (n/25) × neighborhood, which re-grows quadratically no matter how
#: good the retrieval tier is. At sf0.01/sf0.1 every vec_id is under
#: the bound, so the audited set is the full 1-in-25 sample there.
_NOISE_MAX_QUERY_ID = 25 * 100


def _noise_planes():
    from dieter___etl___monarchmoney_spark.operators.similarity import _hyperplanes

    return _hyperplanes(64, _NOISE_BITS, 42)


def _noise_sql() -> str:
    from dieter___etl___monarchmoney_spark.queries.llm_pipeline import _bucket_sql

    planes = _noise_planes()
    return f"""
WITH s AS (
    SELECT vec_id, label, embedding,
           {_bucket_sql('embedding', planes)} AS bucket
    FROM embeddings
),
q AS (
    SELECT vec_id AS query_id, embedding AS qv, label AS own_label,
           bucket AS qb
    FROM s WHERE vec_id % 25 = 0 AND vec_id < {_NOISE_MAX_QUERY_ID}
),
scored AS (
    SELECT q.query_id, q.own_label, s.vec_id, s.label,
           {_dot_sql('s.embedding', 'q.qv')}
           / (sqrt({_dot_sql('s.embedding', 's.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')})) AS similarity
    FROM s, q
    WHERE bit_count(xor(s.bucket, q.qb)) <= {_NOISE_RADIUS}
      AND s.vec_id <> q.query_id
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
       CAST(n_votes AS INT) AS n_votes,
       (voted_label <> own_label AND n_votes >= {_NOISE_MIN_VOTES}) AS suspect
FROM modal
ORDER BY vec_id
"""


@query("knn_label_noise_audit", _noise_sql())
def q_knn_label_noise_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit over the ANN retrieval tier: for a
    deterministic BOUNDED audit batch (the first 100 stripes of the
    1-in-25 sample — a QA pass audits a fixed-size batch, so total
    work is batch × neighborhood, linear in corpus size), the k={K}
    nearest neighbors WITHIN the query's LSH multiprobe neighborhood
    (bucket hamming distance ≤ {R} on a {B}-bit signature — the exact
    candidate set ``lsh_ann_topk(multiprobe={R})`` retrieves) vote on
    the label; every audited vector reports its modal neighbor label
    and a ``suspect`` flag (modal ≠ own AND ≥ {V} votes) — the
    confident-learning-style QA pass a curation pipeline runs before
    trusting labels for filtering or mixture weighting.

    Scale shape (the round-7 ``weak`` fix): the old exact scorer was a
    broadcast nested-loop product (n·n/25 scored rows — quadratic, and
    the broadcast side outgrows memory long before 100 TB). Now each
    query explodes into its {P} probe signatures (plan-time literals)
    and candidates come from an EQUI-join on the bucket id — a hash
    join that shuffles/broadcasts on a key, never a nested loop, and
    scores only Σ(bucket size × probes) rows (~{B}-bit buckets ⇒
    ~n/2^{B} per probe). At 100 TB the signature width grows with
    log₂(n) at index-build time to hold bucket occupancy constant and
    the table is written partitioned by bucket so each probe is
    partition-pruned I/O; fixed {B} bits here keeps the oracle twin
    (same planes as list literals) bit-identical. The salted two-phase
    top-k avoids the per-query reducer funnel; ties in similarity
    break on vec_id; modal ties break on the smaller label — total
    orders on both engines."""
    planes = _noise_planes()
    vectors = load_table(spark, "embeddings", sf_dir)
    sig = vectors.withColumn("bucket", lsh_signature(F.col("embedding"), planes))
    # all bit-flip masks with popcount ≤ radius — the multiprobe
    # neighborhood as a plan-time literal (37 masks for 8 bits, r=2)
    masks = [
        m for m in range(1 << _NOISE_BITS) if bin(m).count("1") <= _NOISE_RADIUS
    ]
    probes = (
        sig.filter(
            (F.col("vec_id") % 25 == 0)
            & (F.col("vec_id") < _NOISE_MAX_QUERY_ID)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("label").alias("own_label"),
            F.col("bucket").alias("qb"),
        )
        .withColumn("_mask", F.explode(F.lit(masks)))
        .select(
            "query_id",
            "qv",
            "own_label",
            F.col("qb").bitwiseXOR(F.col("_mask").cast("bigint")).alias("bucket"),
        )
    )
    scored = (
        sig.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
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
    return modal.select(
        F.col("query_id").alias("vec_id"),
        F.col("own_label").cast("int").alias("own_label"),
        F.col("label").cast("int").alias("neighbor_label"),
        F.col("n_votes").cast("int").alias("n_votes"),
        (
            (F.col("label") != F.col("own_label"))
            & (F.col("n_votes") >= _NOISE_MIN_VOTES)
        ).alias("suspect"),
    ).orderBy("vec_id")
