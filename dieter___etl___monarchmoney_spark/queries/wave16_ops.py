"""Round-4 wave 16: the grouped-map pandas lane (the last unexercised
Arrow path) on a genuinely sequential computation, and vector mean
pooling with exact-decimal per-dimension sums —

- ``event_transition_matrix``: per-user event-type bigrams (the Markov
  transition estimate behind session modeling). Registered as the
  LAG-window JVM form since round 8 (it is window-expressible, so the
  hot path must be); the ``groupBy(user).applyInPandas`` grouped-map
  walk remains as the twin the unit test pins equal — that lane is the
  right tool exactly when each key needs ORDERED sequential iteration
  that column algebra would contort;
- ``label_centroid_similarity``: per-label centroid (mean pooling over
  an array column, the embedding-aggregation primitive) followed by
  the k×k pairwise cosine between centroids — all sums quantized to
  exact decimals so pooling is aggregation-order-independent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

_DEC = "decimal(38,12)"


# --------------------------------------------------------------------------
# Grouped-map applyInPandas: per-user event-type transition counts
# --------------------------------------------------------------------------

_TRANSITION_SQL = """
WITH ordered AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM ordered
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
"""


def _transitions(pdf: pd.DataFrame) -> pd.DataFrame:
    # ordered sequential walk of ONE user's timeline; (ts, event_id) is
    # a total order (no ties in the data; event_id breaks any future tie)
    pdf = pdf.sort_values(["ts", "event_id"])
    types = pdf["event_type"].to_numpy()
    if len(types) < 2:
        return pd.DataFrame(
            {"prev_type": pd.Series([], dtype=str),
             "next_type": pd.Series([], dtype=str),
             "n": pd.Series([], dtype="int64")}
        )
    pairs = pd.DataFrame({"prev_type": types[:-1], "next_type": types[1:]})
    out = pairs.groupby(["prev_type", "next_type"]).size().reset_index(name="n")
    return out


@query("event_transition_matrix", _TRANSITION_SQL)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (the empirical Markov chain over
    user timelines) — LAG window over (user, ts, event_id) + one
    bigram aggregate, fully JVM-side.

    Round-8 decision (VERDICT r7 #6, recorded): this computation IS
    window-expressible, so the registered/benched query is the JVM
    form — the grouped-map ``applyInPandas`` walk
    (:func:`transition_matrix_grouped_map`) was the bench's slowest
    non-streaming query (~6.7 s warm at sf0.1, Arrow serialization of
    every event row) while existing only as a lane showcase. The lane
    keeps full coverage as the TWIN: the unit test runs both forms and
    pins them equal (the same §2.10 discipline, with the roles
    swapped). Grouped-map remains the right tool when the per-key walk
    carries state no fixed-width window expresses (multi-step
    lookbacks, resets, compiled/ML per-key models).

    Scale shape: one shuffle on user_id for the window (skew bounded
    by the busiest user's history — same bound as sessionization),
    then a map-side-combinable |types|² aggregate. Counts are exact
    integers end to end."""
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


def transition_matrix_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped-map pandas lane twin of
    :func:`q_event_transition_matrix`:
    ``groupBy(user_id).applyInPandas`` hands each user's full ordered
    timeline to Python, which walks it sequentially and emits local
    bigram counts; a JVM-side aggregate sums the per-user counts.
    Exercised (and pinned equal to the registered JVM form) by
    tests/test_wave13_ops.py — the sanctioned grouped-map Arrow lane,
    kept out of the bench path since round 8."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    local = ev.groupBy("user_id").applyInPandas(
        _transitions, "prev_type string, next_type string, n long"
    )
    return (
        local.groupBy("prev_type", "next_type")
        .agg(F.sum("n").cast("bigint").alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


# --------------------------------------------------------------------------
# Mean pooling + pairwise centroid cosine, exact-decimal throughout
# --------------------------------------------------------------------------

_CENTROID_SQL = """
WITH longf AS (
    SELECT label,
           unnest(range(1, len(embedding) + 1)) AS i,
           unnest(embedding) AS x
    FROM embeddings
),
cent AS (
    SELECT label, i,
           CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*) AS c
    FROM longf GROUP BY label, i
),
pairs AS (
    SELECT a.label AS label_a, b.label AS label_b,
           CAST(SUM(CAST(a.c * b.c AS DECIMAL(38,12))) AS DOUBLE) AS dot,
           CAST(SUM(CAST(a.c * a.c AS DECIMAL(38,12))) AS DOUBLE) AS na,
           CAST(SUM(CAST(b.c * b.c AS DECIMAL(38,12))) AS DOUBLE) AS nb
    FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
    GROUP BY a.label, b.label
)
SELECT label_a, label_b,
       ROUND(dot / (SQRT(na) * SQRT(nb)), 9) AS cosine
FROM pairs
ORDER BY label_a, label_b
"""


@query("label_centroid_similarity", _CENTROID_SQL)
def q_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean pooling (the embedding-aggregation primitive: per-label
    centroid = per-dimension mean) followed by the pairwise cosine
    between all label centroids — the class-separation diagnostic run
    before trusting labels for curation or sampling.

    Determinism: each per-dimension sum quantizes float32→float64
    values to DECIMAL(38,12) before aggregation (mean pooling is the
    ONE place embedding math must sum across rows, so it gets the
    money-sum treatment); the k×k cosine then operates on identical
    centroid doubles in both engines, with the same product-sum
    quantization across the 64 dims.

    Scale shape: pooling is one posexplode + map-side-combinable
    (label, dim) aggregate — k·d cells out regardless of row count;
    the pairwise stage joins the k·d centroid table to itself on the
    DIMENSION (d-sized join key, k² output), trivially broadcastable.
    At 100 TB only pooling touches the fact; everything after is
    sketch-sized."""
    emb = load_table(spark, "embeddings", sf_dir)
    longf = emb.select(
        "label", F.posexplode("embedding").alias("i0", "x")
    ).select(
        "label",
        (F.col("i0") + 1).alias("i"),
        F.col("x").cast("double").alias("x"),
    )
    cent = longf.groupBy("label", "i").agg(
        (F.sum(F.col("x").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("c")
    )
    a = cent.select(
        F.col("label").alias("label_a"), F.col("i").alias("ia"), F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("i").alias("ib"), F.col("c").alias("cb")
    )
    pairs = (
        a.join(b, (F.col("ia") == F.col("ib")) & (F.col("label_a") < F.col("label_b")))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum((F.col("ca") * F.col("cb")).cast(_DEC)).cast("double").alias("dot"),
            F.sum((F.col("ca") * F.col("ca")).cast(_DEC)).cast("double").alias("na"),
            F.sum((F.col("cb") * F.col("cb")).cast(_DEC)).cast("double").alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(
            F.col("dot") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))), 9
        ).alias("cosine"),
    ).orderBy("label_a", "label_b")


# --------------------------------------------------------------------------
# Bitmap-exact distinct counting (the mergeable EXACT alternative to HLL)
# --------------------------------------------------------------------------

_BITMAP_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("bitmap_distinct_users", _BITMAP_SQL)
def q_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via Spark's bitmap
    aggregate family (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count): each user id
    maps to (bucket, bit); per (event_type, bucket) partial bitmaps
    OR-combine map-side, and the final count sums popcounts. The
    mergeable-EXACT alternative between COUNT(DISTINCT) (exact,
    re-shuffles raw ids) and HLL (mergeable, approximate — the
    hll_daily_merge family): bitmaps pre-aggregate like a sketch but
    count like the truth, at dense-id memory cost.

    Scale shape: the two-level aggregate ships one ≤4 KiB bitmap per
    (type, bucket) instead of one row per (type, user) — the shuffle
    shrinks by the per-bucket duplication factor; at 100 TB this is
    the standard exact-distinct rollup for dense integer keys (sparse
    or string keys: dictionary-encode first or fall back to HLL). The
    oracle is plain COUNT(DISTINCT) — exactness IS the contract."""
    ev = load_table(spark, "events", sf_dir)
    partial = (
        ev.select(
            "event_type",
            F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
            F.bitmap_bit_position(F.col("user_id")).alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).cast("bigint").alias("n_distinct_users"))
        .orderBy("event_type")
    )
