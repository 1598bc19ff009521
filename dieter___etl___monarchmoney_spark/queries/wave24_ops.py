"""Round-4 wave 24: duplicated-SPAN extraction — past the fraction
metrics (duplicated_ngram_fraction reports HOW MUCH of a doc is
duplicated) to WHERE: each document's longest run of consecutive
cross-document 3-gram shingles, i.e. the longest verbatim span shared
with any other document. The span length is what span-level dedup
(RefinedWeb/Gopher-style "remove the duplicated passage, keep the
document") actually cuts on — fractions only tell you whether to look.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.queries.llm_pipeline import _TOKS_SQL
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table
from dieter___etl___monarchmoney_spark.functions.text import tokens


_SPAN_SQL = f"""
WITH toks AS (
    SELECT doc_id, list_filter({_TOKS_SQL}, t -> t <> '') AS t FROM documents
),
sh AS (
    SELECT doc_id, i,
           t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
    FROM toks, unnest(range(1, greatest(len(t) - 2, 0) + 1)) r(i)
),
freq AS (
    SELECT shingle, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY shingle
),
dups AS (
    SELECT s.doc_id, s.i
    FROM sh s JOIN freq f ON f.shingle = s.shingle
    WHERE f.df >= 2
),
runs AS (
    SELECT doc_id, i,
           i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
    FROM dups
),
spans AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
    FROM runs GROUP BY doc_id, grp
),
best AS (
    SELECT doc_id, MAX(run_len) AS max_run FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(b.max_run, 0) AS BIGINT) AS max_dup_shingles,
       CAST(CASE WHEN b.max_run IS NULL THEN 0
                 ELSE b.max_run + 2 END AS BIGINT) AS span_tokens
FROM (SELECT doc_id FROM documents) d
LEFT JOIN best b ON b.doc_id = d.doc_id
ORDER BY d.doc_id
"""


@query("max_duplicated_span", _SPAN_SQL)
def q_max_duplicated_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest cross-document verbatim span per document: positional
    3-gram shingles flagged when they occur in >= 2 DISTINCT docs,
    then the classic gaps-and-islands trick (position minus dense row
    number is constant within a consecutive run) finds each doc's
    longest flagged run; a run of k consecutive 3-grams covers k+2
    tokens. Docs with no shared shingle report 0 — the LEFT join back
    to the corpus keeps them (a span report that silently drops clean
    docs would misread as "everything is duplicated").

    Scale shape: one shingle-count shuffle for document frequency
    (COUNT(DISTINCT doc) — two-level exact, same as the posting-list
    family), one doc-keyed window for the runs; positions ride the
    existing explode so no extra pass. The known refinement at 100 TB
    is hashing shingles to 8-byte ids before the frequency shuffle
    (cuts shuffle bytes ~5x) — same move as minhash's posting lists.
    All outputs are exact integers."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.array_remove(tokens("text"), "").alias("t")
    )
    sh = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.slice(
                    F.col("t"), 1, F.greatest(F.size("t") - 2, F.lit(0))
                ),
                lambda x, i: F.concat_ws(
                    " ",
                    x,
                    F.element_at(F.col("t"), i + 2),
                    F.element_at(F.col("t"), i + 3),
                ),
            )
        ).alias("i0", "shingle"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "shingle")
    freq = (
        sh.select("doc_id", "shingle")
        .distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("shingle")
    )
    dups = sh.join(freq, "shingle", "left_semi").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    runs = dups.withColumn("grp", F.col("i") - F.row_number().over(w))
    best = (
        runs.groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("doc_id")
        .agg(F.max("run_len").alias("max_run"))
    )
    return (
        docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("max_run"), F.lit(0)).cast("bigint").alias(
                "max_dup_shingles"
            ),
            F.when(F.col("max_run").isNull(), 0)
            .otherwise(F.col("max_run") + 2)
            .cast("bigint")
            .alias("span_tokens"),
        )
        .orderBy("doc_id")
    )
