"""Wave 26 (round 5): corpus-analytics completions — the per-language
Pareto frontier (skyline operator), per-source token entropy, the
one-row dataset card, and a k-fold contamination audit.

Oracle discipline: the skyline oracle is the INDEPENDENT quadratic
NOT-EXISTS dominance query, so a green row proves the sweep-line
rewrite, not merely self-consistency; entropy contributions quantize
to DECIMAL(38,18) before summing so neither engine's aggregation
order can flake the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.functions.text import (
    fingerprint_md5,
    quality_score,
)
from dieter___etl___monarchmoney_spark.queries.llm_pipeline import (
    _QUALITY_SQL,
    _hexparse_sql,
)
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

_TOKS_SQL = r"string_split_regex(lower(trim(text)), '\s+')"
_FTOKS_SQL = rf"list_filter({_TOKS_SQL}, t -> t <> '')"

# --------------------------------------------------------------------------
# Per-language Pareto frontier (skyline)
# --------------------------------------------------------------------------

_SKYLINE_SQL = rf"""
WITH scored AS (
    SELECT doc_id, lang,
           {_QUALITY_SQL} AS q,
           CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
    FROM documents
)
SELECT s.lang, s.doc_id, ROUND(s.q, 9) AS quality, s.n_tokens
FROM scored s
WHERE NOT EXISTS (
    SELECT 1 FROM scored o
    WHERE o.lang = s.lang
      AND ((o.q > s.q AND o.n_tokens >= s.n_tokens)
        OR (o.q >= s.q AND o.n_tokens > s.n_tokens))
)
ORDER BY s.lang, s.doc_id
"""


@query("pareto_quality_frontier", _SKYLINE_SQL)
def q_pareto_quality_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Pareto frontier (skyline) on (quality ↑, length ↑):
    the documents no other same-language document beats on both axes —
    the exact set a curation budget sweep walks when trading quality
    against token yield.

    The oracle is the textbook O(n²) NOT-EXISTS dominance query; the
    Spark plan is the sweep-line rewrite: per (lang, q) group-max of
    length, a lang-partitioned window takes the running best length
    over strictly-higher quality (DESC order, 1-preceding frame), and
    a document survives iff it holds its group's max AND beats every
    higher-quality group's best. Two aggregates + one window over
    group rows — no self-join, no quadratic anything; partitioned by
    lang throughout (the same no-global-window discipline as
    customer_balance_rank_surface)."""
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        "doc_id",
        "lang",
        quality_score("text").alias("q"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("bigint")
        .alias("n_tokens"),
    )
    groups = scored.groupBy("lang", "q").agg(F.max("n_tokens").alias("gy"))
    w_prev = (
        Window.partitionBy("lang")
        .orderBy(F.col("q").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    groups = groups.withColumn("prev_best", F.max("gy").over(w_prev))
    return (
        scored.join(groups, ["lang", "q"])
        .filter(
            (F.col("n_tokens") == F.col("gy"))
            & (F.col("prev_best").isNull() | (F.col("n_tokens") > F.col("prev_best")))
        )
        .select("lang", "doc_id", F.round("q", 9).alias("quality"), "n_tokens")
        .orderBy("lang", "doc_id")
    )


# --------------------------------------------------------------------------
# Per-source token entropy / lexical diversity
# --------------------------------------------------------------------------

_ENTROPY_SQL = rf"""
WITH words AS (
    SELECT source, unnest({_FTOKS_SQL}) AS word FROM documents
),
wc AS (
    SELECT source, word, COUNT(*) AS c FROM words GROUP BY source, word
),
tot AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM wc GROUP BY source
)
SELECT wc.source, t.n_tokens, t.n_types,
       ROUND(CAST(SUM(CAST(-(CAST(c AS DOUBLE) / t.n_tokens)
                            * ln(CAST(c AS DOUBLE) / t.n_tokens)
                            AS DECIMAL(38,18))) AS DOUBLE), 9) AS entropy,
       ROUND(CAST(t.n_types AS DOUBLE) / t.n_tokens, 9) AS type_token_ratio
FROM wc JOIN tot t USING (source)
GROUP BY wc.source, t.n_tokens, t.n_types
ORDER BY wc.source
"""


@query("token_entropy_by_source", _ENTROPY_SQL)
def q_token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the unigram distribution and type-token ratio
    per source — the lexical-diversity panel of a corpus datasheet
    (low entropy flags boilerplate-heavy or templated sources before
    they flood a training mix).

    Scale shape: one (source, word)-keyed aggregate with map-side
    combine carries the whole cost; the per-source totals join is
    |sources| rows broadcast back, and the entropy sum runs over the
    compact (source, word) count table. Each −p·ln p term quantizes to
    DECIMAL(38,18) before SUM, so the hash is aggregation-order-proof
    (the determinism contract of dup_graph_pagerank applied to ln)."""
    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        "source",
        F.explode_outer(
            F.array_remove(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), "")
        ).alias("word"),
    ).filter(F.col("word").isNotNull())
    wc = words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c"))
    tot = wc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    p = F.col("c").cast("double") / F.col("n_tokens")
    return (
        wc.join(F.broadcast(tot), "source")
        .groupBy("source", "n_tokens", "n_types")
        .agg(
            F.round(
                F.sum((-p * F.log(p)).cast("decimal(38,18)")).cast("double"), 9
            ).alias("entropy")
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "entropy",
            F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 9).alias(
                "type_token_ratio"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Dataset card (one-row corpus datasheet)
# --------------------------------------------------------------------------

_CARD_SQL = rf"""
WITH per_doc AS (
    SELECT doc_id, lang, source,
           CAST(len({_FTOKS_SQL}) AS BIGINT) AS n_tokens,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
    FROM documents
),
dups AS (
    SELECT COUNT(*) AS n_dup_groups,
           COALESCE(CAST(SUM(cnt - 1) AS BIGINT), 0) AS n_redundant_docs
    FROM (SELECT fp, COUNT(*) AS cnt FROM per_doc GROUP BY fp HAVING COUNT(*) > 1)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 9) AS en_frac,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 9) AS mean_doc_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_doc_tokens,
       CAST(d.n_dup_groups AS BIGINT) AS n_dup_groups,
       d.n_redundant_docs
FROM per_doc CROSS JOIN dups d
GROUP BY d.n_dup_groups, d.n_redundant_docs
"""


@query("dataset_card_stats", _CARD_SQL)
def q_dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dataset card: corpus size, language/source breadth,
    token volume, and exact-duplicate pressure — the summary block a
    datasheet or mixture planner reads before anything else.

    Scale shape: one pass computes the per-doc projection (token count
    + md5 fingerprint); the card is a single map-side-combinable
    aggregate over it plus a fingerprint aggregate for the dup block,
    cross-joined as a 1-row broadcast. COUNT(DISTINCT lang/source) is
    exact over low-cardinality dims (the 100 TB form swaps in
    approx_count_distinct where the dim is unbounded)."""
    docs = load_table(spark, "documents", sf_dir)
    per_doc = docs.select(
        "lang",
        "source",
        F.size(F.array_remove(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), ""))
        .cast("bigint")
        .alias("n_tokens"),
        fingerprint_md5("text").alias("fp"),
    )
    dups = (
        per_doc.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dup_groups"),
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0))
            .cast("bigint")
            .alias("n_redundant_docs"),
        )
    )
    card = per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("en_frac"),
        F.round(F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 9).alias(
            "mean_doc_tokens"
        ),
        F.max("n_tokens").cast("bigint").alias("max_doc_tokens"),
    )
    return card.crossJoin(F.broadcast(dups))


# --------------------------------------------------------------------------
# k-fold contamination audit (dup groups spanning folds)
# --------------------------------------------------------------------------

_KFOLDS = 5

_FOLD_BUCKET_SQL = f"{_hexparse_sql('substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)')} % {_KFOLDS}"

_KFOLD_LEAK_SQL = rf"""
WITH assigned AS (
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
           {_FOLD_BUCKET_SQL} AS fold
    FROM documents
)
SELECT fp,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT fold) AS BIGINT) AS n_folds,
       CAST(COUNT(DISTINCT fold) > 1 AS BOOLEAN) AS leaky
FROM assigned
GROUP BY fp
HAVING COUNT(*) > 1
ORDER BY fp
"""


@query("kfold_leakage_audit", _KFOLD_LEAK_SQL)
def q_kfold_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-validation contamination audit: exact-duplicate groups
    whose members land in MORE THAN ONE hash-assigned fold — each such
    group leaks its content between a training and a held-out fold,
    silently inflating eval scores (the cross-validation twin of
    decontamination_overlap's train/eval concern). Row-id hash
    splitting cannot prevent this — only CONTENT-keyed splitting can —
    which is exactly what this audit demonstrates and a pipeline
    alerts on.

    Scale shape: one projection computing fingerprint + fold, one
    fingerprint-keyed aggregate with map-side combine; dup groups are
    the rare output, never a join input."""
    docs = load_table(spark, "documents", sf_dir)
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % _KFOLDS
    )
    assigned = docs.select(
        fingerprint_md5("text").alias("fp"), fold.alias("fold")
    )
    return (
        assigned.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("fold").cast("bigint").alias("n_folds"),
        )
        .filter(F.col("n_docs") > 1)
        .select("fp", "n_docs", "n_folds", (F.col("n_folds") > 1).alias("leaky"))
        .orderBy("fp")
    )
