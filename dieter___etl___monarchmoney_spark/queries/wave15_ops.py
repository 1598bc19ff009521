"""Round-4 wave 15: pipeline observability and schema drift —

- a per-stage curation FUNNEL report (rows + tokens surviving each
  stage of the corpus_curation chain) — the number every training-data
  pipeline dashboard leads with, computed in the same single-scan pass
  as the chain itself;
- a schema-evolution read: two parquet batches written with DIFFERENT
  schemas (a column added mid-stream) merged by ``mergeSchema`` into
  one typed frame with null backfill — the drift case every long-lived
  ingestion hits.

Reference framing: the reference reloads whole sheets and has neither
stage accounting nor schema migration; these extend the engine claim
(FIXTURES.md) with the operational surfaces around the data itself.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.functions.text import (
    fingerprint_md5,
    quality_score,
    token_count,
)
from dieter___etl___monarchmoney_spark.queries.llm_pipeline import (
    _MINHASH_SIG_SQL,
    _QUALITY_SQL,
    _TOKS_SQL,
)
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table, sf_tag


# --------------------------------------------------------------------------
# Curation funnel: rows + tokens surviving each stage
# --------------------------------------------------------------------------

_MIN_TOKENS = 16

_FUNNEL_STAGES_SQL = (
    _MINHASH_SIG_SQL
    + rf""",
    near_dup_losers AS (
        SELECT DISTINCT b.doc_id AS doc_id
        FROM bands a JOIN bands b USING (band_key)
        WHERE a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT doc_id,
               {_QUALITY_SQL} AS quality,
               len({_TOKS_SQL}) AS n_tokens,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
    ),
    flags AS (
        SELECT *,
               (n_tokens >= {_MIN_TOKENS}) AS s1,
               (n_tokens >= {_MIN_TOKENS} AND quality >= 0.5) AS s2
        FROM scored
    ),
    grp AS (
        SELECT *,
               MIN(CASE WHEN s2 THEN doc_id END) OVER (PARTITION BY fp) AS gmin
        FROM flags
    ),
    f2 AS (
        SELECT *,
               (s2 AND doc_id = gmin) AS s3,
               (s2 AND doc_id = gmin
                   AND doc_id NOT IN (SELECT doc_id FROM near_dup_losers)) AS s4
        FROM grp
    )
    SELECT * FROM (
        SELECT 0 AS stage_id, 'raw' AS stage,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM f2
        UNION ALL
        SELECT 1, 'min_length', CAST(COUNT(CASE WHEN s1 THEN 1 END) AS BIGINT),
               CAST(SUM(CASE WHEN s1 THEN n_tokens ELSE 0 END) AS BIGINT)
        FROM f2
        UNION ALL
        SELECT 2, 'quality', CAST(COUNT(CASE WHEN s2 THEN 1 END) AS BIGINT),
               CAST(SUM(CASE WHEN s2 THEN n_tokens ELSE 0 END) AS BIGINT)
        FROM f2
        UNION ALL
        SELECT 3, 'exact_dedup', CAST(COUNT(CASE WHEN s3 THEN 1 END) AS BIGINT),
               CAST(SUM(CASE WHEN s3 THEN n_tokens ELSE 0 END) AS BIGINT)
        FROM f2
        UNION ALL
        SELECT 4, 'near_dedup', CAST(COUNT(CASE WHEN s4 THEN 1 END) AS BIGINT),
               CAST(SUM(CASE WHEN s4 THEN n_tokens ELSE 0 END) AS BIGINT)
        FROM f2
    ) ORDER BY stage_id
    """
)


@query("pipeline_stage_funnel", _FUNNEL_STAGES_SQL)
def q_pipeline_stage_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus_curation chain as a FUNNEL REPORT: documents and
    tokens surviving each stage (raw → min-length → quality → exact
    dedup → MinHash near-dedup) — the observability row every
    training-data pipeline publishes next to its output. Stage
    semantics mirror corpus_curation exactly (same quality threshold,
    same fingerprint window, same LSH loser set), with the min-length
    gate added up front.

    Scale shape: ONE scan computes all per-doc flags; the exact-dedup
    stage is the same single fingerprint-window shuffle as the chain
    itself (min of the stage-2 survivors per fingerprint, computed
    over the full frame with a conditional MIN — no second scan of a
    filtered copy); the near-dup losers come from the banded MinHash
    join and arrive as a broadcast flag; the five stage rows are
    CONDITIONAL SUMS over the one flagged frame, unpivoted at the end
    — adding observability costs zero extra passes over the corpus.
    All outputs are exact integers. The loser flag reads the shared
    materialized MinHash pair table (llm_pipeline.shared_minhash_pairs)
    instead of re-running signatures + banding."""
    from dieter___etl___monarchmoney_spark.queries.llm_pipeline import (
        shared_minhash_pairs,
    )

    docs = load_table(spark, "documents", sf_dir)
    losers = (
        shared_minhash_pairs(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_loser", F.lit(True))
    )
    scored = docs.select(
        "doc_id",
        quality_score("text").alias("quality"),
        token_count("text").alias("n_tokens"),
        fingerprint_md5("text").alias("fp"),
    )
    s1 = F.col("n_tokens") >= _MIN_TOKENS
    s2 = s1 & (F.col("quality") >= 0.5)
    flagged = scored.select("doc_id", "n_tokens", "fp", s1.alias("s1"), s2.alias("s2"))
    gmin = F.min(F.when(F.col("s2"), F.col("doc_id"))).over(Window.partitionBy("fp"))
    with_grp = flagged.withColumn("gmin", gmin).withColumn(
        "s3", F.col("s2") & (F.col("doc_id") == F.col("gmin"))
    )
    with_loser = with_grp.join(F.broadcast(losers), "doc_id", "left").withColumn(
        "s4", F.col("s3") & F.col("is_loser").isNull()
    )

    def cnt(flag):
        return F.count(F.when(flag, 1)).cast("bigint")

    def toks(flag):
        return F.sum(F.when(flag, F.col("n_tokens")).otherwise(0)).cast("bigint")

    agg = with_loser.agg(
        F.count(F.lit(1)).cast("bigint").alias("c0"),
        F.sum("n_tokens").cast("bigint").alias("t0"),
        cnt(F.col("s1")).alias("c1"),
        toks(F.col("s1")).alias("t1"),
        cnt(F.col("s2")).alias("c2"),
        toks(F.col("s2")).alias("t2"),
        cnt(F.col("s3")).alias("c3"),
        toks(F.col("s3")).alias("t3"),
        cnt(F.col("s4")).alias("c4"),
        toks(F.col("s4")).alias("t4"),
    )
    names = ["raw", "min_length", "quality", "exact_dedup", "near_dedup"]
    stack_args = ", ".join(
        f"{i}, '{n}', c{i}, t{i}" for i, n in enumerate(names)
    )
    return (
        agg.selectExpr(
            f"stack(5, {stack_args}) AS (stage_id, stage, n_docs, n_tokens)"
        )
        .select(
            F.col("stage_id").cast("int").alias("stage_id"),
            "stage",
            "n_docs",
            "n_tokens",
        )
        .orderBy("stage_id")
    )


# --------------------------------------------------------------------------
# Schema-evolution read: mergeSchema over batches with drifted schemas
# --------------------------------------------------------------------------

_EVO_SQL = """
SELECT CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_type END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
ORDER BY channel NULLS FIRST
"""


def _digest(sf_dir: str) -> str:
    return sf_tag(sf_dir, 10)  # shared helper: sources/parquet.py


@query("schema_evolution_merge_read", _EVO_SQL)
def q_schema_evolution_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift at the SCAN: batch v1 of an ingestion wrote
    (event_id, value); batch v2 added a ``channel`` column mid-stream.
    ``mergeSchema=true`` reconciles the footers into one typed frame —
    v1 rows surface channel = NULL — and the per-channel rollup runs
    over the union. The oracle derives the same split from the source
    table directly (even ids → v1/no channel), so a green row proves
    the merged read neither drops rows nor misassigns the backfilled
    NULLs.

    Scale shape: schema merge is a FOOTER operation (per-file schema
    reconciliation at planning time; Spark reads each file with its
    own physical schema and projects missing columns as nulls) — no
    data rewrite, no shuffle; this is exactly how a 100 TB table
    absorbs additive schema changes without migration. The fixture is
    cached per sf_dir (layout, not computation); production note: pin
    mergeSchema per-table (table property / spark.sql.parquet.
    mergeSchema) rather than rewriting history."""
    out = os.path.join(tempfile.gettempdir(), f"schema_evo_{_digest(sf_dir)}")
    marker = os.path.join(out, "_SUCCESS_LAYOUT")
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        ev = load_table(spark, "events", sf_dir)
        v1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "value")
        v2 = ev.filter(F.col("event_id") % 2 == 1).select(
            "event_id", "value", F.col("event_type").alias("channel")
        )
        v1.write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
        v2.write.mode("overwrite").parquet(os.path.join(out, "batch=2"))
        with open(marker, "w") as fh:
            fh.write("ok")
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "batch=1"), os.path.join(out, "batch=2")
    )
    return (
        merged.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy(F.col("channel").asc_nulls_first())
    )
