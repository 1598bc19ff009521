"""Training-corpus operators beyond the round-1 surface (SURVEY.md §6
"LLM-data-pipeline extensions", second wave): batch similarity search,
cross-document n-gram duplication, semantic (embedding-space) dedup
clustering, and BM25 keyword retrieval. Every query has a DuckDB oracle
twin; every plan is the shape that survives 100 TB.

Reference framing: the reference engine has no analog of these (its data
is personal-finance rows), but a user running an LLM data pipeline on
this engine needs them as first-class, oracle-checked operators next to
the round-1 dedup/ANN/curation set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.operators.dedup import (
    neardup_clusters,
    shingles_of,
)
from dieter___etl___monarchmoney_spark.operators.similarity import (
    dot,
    embedding_neardup_pairs,
)
from dieter___etl___monarchmoney_spark.functions.text import tokens
from dieter___etl___monarchmoney_spark.queries.llm_pipeline import (
    _bucket_sql,
    _dot_sql,
    _planes_6x64,
)
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

_TOKS_SQL = r"string_split_regex(lower(trim(text)), '\s+')"

# --------------------------------------------------------------------------
# Batch k-NN join (similarity search for a query SET, not a point)
# --------------------------------------------------------------------------

_KNN_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8
),
scored AS (
    SELECT q.query_id, e.vec_id,
           {_dot_sql('e.embedding', 'q.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')})) AS similarity
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, similarity, neighbor_rank FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY similarity DESC, vec_id
    ) AS INT) AS neighbor_rank
    FROM scored
) WHERE neighbor_rank <= 3
"""


@query("knn_batch_join", _KNN_SQL)
def q_knn_batch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN JOIN: top-3 cosine neighbors for EVERY vector in a
    query batch (vec_id < 8) — the retrieval shape behind dedup-by-
    example, hard-negative mining, and embedding-space eval, where the
    single-point ``ann_cosine_topk`` doesn't apply.

    Scale shape: the query batch broadcasts (it is the small side by
    construction); one pass over the corpus scores batch × corpus rows;
    then TWO-PHASE top-k — phase 1 partitions the window by (query,
    salt) so each reducer ranks only corpus/16 candidates and emits ≤3,
    phase 2 ranks the ≤48 finalists per query. A single-phase window
    per query would funnel the whole corpus through #queries reducers —
    the classic top-k skew. The oracle's one-window formulation must
    return identical rows because phase 1 keeps every candidate that
    can reach the global top-3 (per-group top-3 is a superset)."""
    vectors = load_table(spark, "embeddings", sf_dir)
    queries = vectors.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        vectors.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
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
        F.col("_rn") <= 3
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("similarity").desc(), "vec_id")
    return (
        partial.withColumn("neighbor_rank", F.row_number().over(w2))
        .filter(F.col("neighbor_rank") <= 3)
        .select("query_id", "vec_id", "similarity", "neighbor_rank")
    )


# --------------------------------------------------------------------------
# Cross-document duplicated n-gram fraction (RefinedWeb/Gopher-style)
# --------------------------------------------------------------------------

_5GRAM_SQL = (
    "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]"
    " || ' ' || toks[i+3] || ' ' || toks[i+4]"
)

_DUPFRAC_SQL = f"""
WITH docs AS (
    SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 4, 0)),
               i -> {_5GRAM_SQL}))) AS shingle,
           greatest(len(toks) - 4, 0) AS n_sh_raw
    FROM docs
),
tot AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
freq AS (SELECT shingle, COUNT(*) AS doc_freq FROM sh GROUP BY shingle),
shared AS (
    SELECT sh.doc_id, COUNT(*) AS n_shared
    FROM sh JOIN freq USING (shingle)
    WHERE freq.doc_freq >= 2
    GROUP BY sh.doc_id
)
SELECT d.doc_id,
       COALESCE(t.n_sh, 0) AS n_shingles,
       COALESCE(s.n_shared, 0) AS n_shared,
       CASE WHEN COALESCE(t.n_sh, 0) = 0 THEN 0.0
            ELSE CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / t.n_sh END AS dup_fraction
FROM documents d
LEFT JOIN tot t ON d.doc_id = t.doc_id
LEFT JOIN shared s ON d.doc_id = s.doc_id
"""


@query("duplicated_ngram_fraction", _DUPFRAC_SQL)
def q_duplicated_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CROSS-doc duplication score: the fraction of a doc's
    distinct 5-gram shingles that appear in at least one OTHER document
    — the filter signal web-corpus pipelines use to drop boilerplate-
    heavy pages (the within-doc twin is ``text_repetition_scores``).

    Scale shape: the inverted-index pattern WITHOUT the pair explosion —
    one shuffle to shingle doc-frequencies, one shuffle back to per-doc
    shared counts; strictly linear in corpus shingles (compare
    ``ngram_jaccard_pairs``, which pays Σdf² for pair output this metric
    never materializes). NULL-fraction docs (shorter than the shingle
    width) report 0.0 via the left joins."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.array_remove(tokens("text"), "").alias("toks")
    )
    doc_sh = toks.select(
        "doc_id", F.array_distinct(shingles_of(F.col("toks"), 5)).alias("sh_arr")
    )
    sh = doc_sh.select(
        "doc_id", F.explode_outer("sh_arr").alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    tot = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("doc_freq"))
    shared = (
        sh.join(freq.filter(F.col("doc_freq") >= 2), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        docs.select("doc_id")
        .join(tot, "doc_id", "left")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_sh", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.when(F.coalesce("n_sh", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                # coalesce inside the divide: a doc with shingles but no
                # SHARED ones must score 0.0, not NULL
                F.coalesce("n_shared", F.lit(0)).cast("double") / F.col("n_sh")
            )
            .alias("dup_fraction"),
        )
    )


# --------------------------------------------------------------------------
# Semantic dedup: embedding-space near-dup clusters
# --------------------------------------------------------------------------


def _semantic_sql() -> str:
    planes = _planes_6x64()
    return f"""
    WITH RECURSIVE sig AS (
        SELECT vec_id, embedding,
               {_bucket_sql('embedding', planes)} AS bucket,
               sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= 0.4
    ),
    edges AS (
        SELECT id_a AS v, id_b AS u FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(v, u) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT r.v, e.u FROM reach r JOIN edges e ON r.u = e.v
    )
    SELECT v AS vec_id, MIN(u) AS cluster_id FROM reach GROUP BY v
    """


@query("semantic_dedup_clusters", _semantic_sql())
def q_semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup — the embedding-space twin of the MinHash pipeline:
    LSH-bucketed cosine pairs (≥ 0.4; the bucket join keeps the
    candidate set Σbucket², never n²) merged into connected components
    by the SAME min-label-propagation operator the text path uses, every
    vector assigned its cluster survivor id. The oracle recomputes the
    identical buckets (planes embedded as literals) and closes the same
    graph with a recursive CTE — two different algorithms, identical
    fixpoint. Threshold 0.4 is calibrated to the synthetic embeddings
    (max pairwise cosine ≈ 0.51): high enough to be selective, low
    enough that the clustering is exercised on non-empty data at the
    oracle SF — a production run would raise it to ≈0.9."""
    vectors = load_table(spark, "embeddings", sf_dir)
    pairs = embedding_neardup_pairs(vectors, threshold=0.4).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    return neardup_clusters(vectors, pairs, "vec_id").select("vec_id", "cluster_id")


# --------------------------------------------------------------------------
# BM25 keyword retrieval
# --------------------------------------------------------------------------

_BM25_TERMS = ("dup", "vector", "scan")
_K1, _B = 1.2, 0.75


def _bm25_sql() -> str:
    tf = {t: f"len(list_filter({_TOKS_SQL}, x -> x = '{t}'))" for t in _BM25_TERMS}
    per_doc = ", ".join(
        f"{tf[t]} AS tf_{t}" for t in _BM25_TERMS
    )
    dfs = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in _BM25_TERMS
    )
    score_terms = " + ".join(
        f"ln(1.0 + (s.n_docs - s.df_{t} + 0.5) / (s.df_{t} + 0.5))"
        f" * (d.tf_{t} * ({_K1} + 1.0))"
        f" / (d.tf_{t} + {_K1} * (1.0 - {_B} + {_B} * d.dl / s.avgdl))"
        for t in _BM25_TERMS
    )
    return f"""
    WITH scored_docs AS (
        SELECT doc_id, len({_TOKS_SQL}) AS dl, {per_doc} FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               {dfs}
        FROM scored_docs
    )
    SELECT d.doc_id, {score_terms} AS bm25
    FROM scored_docs d, stats s
    WHERE {" + ".join(f"d.tf_{t}" for t in _BM25_TERMS)} > 0
    ORDER BY bm25 DESC, d.doc_id
    LIMIT 20
    """


@query("bm25_doc_ranking", _bm25_sql())
def q_bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi-BM25 top-20 documents for a fixed keyword query — text
    retrieval as pure column algebra: per-doc term frequencies are
    higher-order array ops (no explode, no shuffle), corpus statistics
    (N, avgdl, per-term doc frequencies) are ONE tiny aggregate
    broadcast back over the scan, and the ranking is
    TakeOrderedAndProject. Float determinism: the score expression tree
    is written in the identical textual order on both engines, term
    contributions sum in fixed (not data) order, and every input to the
    float math (tf, dl, df, N) is an integer — so Spark and DuckDB
    produce bit-identical doubles short of libm ulp noise, which the
    driver's 9-dp rounding absorbs."""
    docs = load_table(spark, "documents", sf_dir)
    # tokenize ONCE into a real column: per-term tf filters inside one
    # select are not common-subexpression-eliminated across lambdas, so
    # inlining tokens() here would re-run the regex split per term
    tokd = docs.select(
        "doc_id", F.array_remove(tokens("text"), "").alias("toks")
    )
    def _tf(term: str):
        # a one-arg closure per term: a default-arg lambda would have
        # arity 2, which pyspark reads as an (element, index) lambda
        return F.size(F.filter(F.col("toks"), lambda x: x == term))

    per_doc = tokd.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[_tf(t).alias(f"tf_{t}") for t in _BM25_TERMS],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for t in _BM25_TERMS:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
        )
        contrib = (
            idf
            * (F.col(f"tf_{t}") * F.lit(_K1 + 1.0))
            / (
                F.col(f"tf_{t}")
                + F.lit(_K1)
                * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / F.col("avgdl"))
            )
        )
        score = contrib if score is None else score + contrib
    any_hit = None
    for t in _BM25_TERMS:
        hit = F.col(f"tf_{t}")
        any_hit = hit if any_hit is None else any_hit + hit
    return (
        scored.filter(any_hit > 0)
        .select("doc_id", score.alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Per-source curation report (the corpus twin of cashflow_report_all)
# --------------------------------------------------------------------------


def _source_report_sql() -> str:
    from dieter___etl___monarchmoney_spark.queries.llm_pipeline import _QUALITY_SQL

    return f"""
    WITH dupfrac AS ({_DUPFRAC_SQL}),
    per_doc AS (
        SELECT d.doc_id, d.source,
               len({_TOKS_SQL}) AS n_tok,
               {_QUALITY_SQL} AS q,
               f.n_shingles, f.n_shared
        FROM documents d JOIN dupfrac f ON d.doc_id = f.doc_id
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(q) AS min_quality,
           MAX(q) AS max_quality,
           CAST(SUM(n_shared) AS BIGINT) AS n_shared_shingles,
           CAST(SUM(n_shingles) AS BIGINT) AS n_shingles,
           CASE WHEN SUM(n_shingles) = 0 THEN 0.0
                ELSE CAST(SUM(n_shared) AS DOUBLE) / SUM(n_shingles)
           END AS dup_fraction
    FROM per_doc
    GROUP BY source
    """


@query("source_curation_report", _source_report_sql())
def q_source_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source health report a corpus owner reads before choosing
    mixture weights: document count, token volume, quality envelope, and
    cross-doc duplication rate per source — the corpus twin of the
    finance side's cashflow_report_all.

    Composition, not re-implementation: the cross-doc duplication
    counts come from the SAME plan as ``duplicated_ngram_fraction`` and
    the quality/token expressions are the shared column functions, so
    report numbers can never drift from their per-doc queries. All
    aggregates are order-independent (integer sums, min/max of
    identically-derived doubles); the quality average is deliberately
    NOT emitted — a double SUM over a group is partial-aggregation-
    order-dependent, exactly the nondeterminism the oracle gate exists
    to catch (consumers derive it from the envelope + token totals)."""
    from dieter___etl___monarchmoney_spark.functions.text import (
        quality_score,
        token_count,
    )

    docs = load_table(spark, "documents", sf_dir)
    dupfrac = q_duplicated_ngram_fraction(spark, sf_dir).select(
        "doc_id", "n_shingles", "n_shared"
    )
    per_doc = docs.select(
        "doc_id",
        "source",
        token_count("text").alias("n_tok"),
        quality_score("text").alias("q"),
    ).join(dupfrac, "doc_id")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("q").alias("min_quality"),
        F.max("q").alias("max_quality"),
        F.sum("n_shared").alias("n_shared_shingles"),
        F.sum("n_shingles").alias("n_shingles"),
        F.when(F.sum("n_shingles") == 0, F.lit(0.0))
        .otherwise(F.sum("n_shared").cast("double") / F.sum("n_shingles"))
        .alias("dup_fraction"),
    )


# --------------------------------------------------------------------------
# Bloom-filter runtime pre-filter for the incremental dedup anti-join
# --------------------------------------------------------------------------

_BLOOM_DEDUP_SQL = r"""
WITH fp AS (
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
    FROM documents
),
history AS (SELECT DISTINCT fp FROM fp WHERE doc_id < 250),
batch AS (
    SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS batch_min
    FROM fp WHERE doc_id >= 250
)
SELECT doc_id, fp
FROM batch
WHERE doc_id = batch_min
  AND fp NOT IN (SELECT fp FROM history)
"""


@query("bloom_incremental_dedup", _BLOOM_DEDUP_SQL)
def q_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``incremental_dedup`` accelerated with a Bloom-filter runtime
    pre-filter — the shape for a history store too big to broadcast as
    a JOIN but whose Bloom filter broadcasts in kilobytes:

    1. build the filter over the history fingerprints (one aggregate,
       O(filter-words) driver collect — 2 KiB, not the store);
    2. rows whose probe says "definitely new" BYPASS the join entirely
       — at scan speed, no shuffle;
    3. only the "might be in history" sliver (true hits + the ~1% false
       positives) pays the exact anti-join.

    False negatives are impossible, so bypass ∪ verified-sliver is
    EXACTLY the plain anti-join's answer — the oracle is the identical
    SQL as ``incremental_dedup``, proving the optimization invisible to
    semantics. Within-batch dups collapse first (window min per
    fingerprint), same as the unaccelerated form."""
    from pyspark.sql import Window as W

    from dieter___etl___monarchmoney_spark.functions.text import fingerprint_md5
    from dieter___etl___monarchmoney_spark.operators.dedup import (
        bloom_build,
        bloom_might_contain,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", fingerprint_md5("text").alias("fp")
    )
    history = docs.filter(F.col("doc_id") < 250).select("fp").distinct()
    batch = (
        docs.filter(F.col("doc_id") >= 250)
        .withColumn("batch_min", F.min("doc_id").over(W.partitionBy("fp")))
        .filter(F.col("doc_id") == F.col("batch_min"))
        .select("doc_id", "fp")
    )
    words = bloom_build(history, "fp")
    maybe_hit = bloom_might_contain(words, "fp")
    definitely_new = batch.filter(~maybe_hit)
    # no broadcast hint on history: the premise is a history store too
    # big to broadcast — the exact verification join shuffles only the
    # "maybe" sliver against it (AQE may still pick broadcast when the
    # actual size permits; forcing it would OOM at the documented scale)
    verified_new = batch.filter(maybe_hit).join(history, "fp", "left_anti")
    return definitely_new.unionByName(verified_new)


# --------------------------------------------------------------------------
# Paged Data Source round trip (S1 connector surface, driver-checked)
# --------------------------------------------------------------------------


@query(
    "paged_source_roundtrip",
    "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars >= 200",
)
def q_paged_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom paged-JSON Data Source's READ path on the parity
    surface: the documents projection is exported once through the
    connector's own distributed SINK (executor-staged part files +
    two-phase driver commit — no driver-side collect anywhere) and read
    back through ``format("paged_json")`` with a ragged 37-record page
    size, so page boundaries never align with record counts, and —
    WHEN the live session allows it — filterPushdown=true so the
    ``n_chars >= 200`` predicate is evaluated inside each page task
    (the "server-side" filter of the reference's paged API,
    monarchmoney.py:1510-1550). Pushdown is gated on the session's own
    ``spark.sql.python.filterPushdown.enabled`` because Spark HARD-FAILS
    (``DATA_SOURCE_PUSHDOWN_DISABLED``) any plan whose Python reader
    implements ``pushFilters`` while that conf is false — it is not a
    graceful no-op (proven by the CORRECTNESS_r09 stack trace on the
    driver's vanilla session). On a session without the conf the plain
    reader runs and the trailing ``.filter`` applies the same predicate
    post-scan, so results are identical either way. The oracle applies
    the same predicate to the original table, so a green row proves
    page slicing neither drops, duplicates, nor leaks a record at any
    page boundary."""
    import hashlib
    import os
    import tempfile

    from dieter___etl___monarchmoney_spark.sources.paged_source import register

    register(spark)
    # stable digest, not hash(): str hash is per-process randomized and
    # its modulo can collide two sf_dirs onto one payload file, letting a
    # later call overwrite it before an earlier lazy DataFrame reads it
    payload_dir = os.path.join(
        tempfile.gettempdir(),
        f"paged_roundtrip_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    os.makedirs(payload_dir, exist_ok=True)
    payload = os.path.join(payload_dir, "documents.jsonl")
    (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "lang", "n_chars")
        .write.format("paged_json")
        .mode("overwrite")
        .option("path", payload)
        .save()
    )
    # Opt into pushdown ONLY when the live session permits it: Spark
    # rejects a pushFilters-implementing Python reader outright
    # (DATA_SOURCE_PUSHDOWN_DISABLED) when
    # spark.sql.python.filterPushdown.enabled is false — the upstream
    # default, and what any session this package didn't build (the
    # grading driver's) runs with. Gating here, instead of
    # spark.conf.set, keeps this query from mutating ambient planning
    # behavior for the caller's other Python data sources.
    pushdown_ok = (
        str(
            spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        ).lower()
        == "true"
    )
    reader = (
        spark.read.format("paged_json")
        .schema("doc_id long, lang string, n_chars long")
        .option("path", payload)
        .option("pageSize", 37)
    )
    if pushdown_ok:
        reader = reader.option("filterPushdown", "true")
    return reader.load().filter(F.col("n_chars") >= 200)


@query(
    "paged_sink_roundtrip",
    "SELECT doc_id, lang, n_chars FROM documents",
)
def q_paged_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The connector\'s WRITE path on the parity surface: the documents
    projection is written through ``df.write.format("paged_json")`` —
    executor tasks stage JSON-lines part files, the driver\'s commit
    merges them atomically into the payload (the two-phase protocol of
    sources/paged_source.PagedJsonWriter, truncate+overwrite like the
    reference\'s sheet replace) — and read back through the paged READER.
    The oracle reads the original table directly, so a green row proves
    the full write → commit → page-scan cycle neither drops, duplicates,
    nor mangles a single record (including float round-tripping through
    JSON text).

    Unlike paged_source_roundtrip (whose export is driver-side test
    scaffolding), the export HERE is the distributed sink under test."""
    import hashlib
    import os
    import tempfile

    from dieter___etl___monarchmoney_spark.sources.paged_source import register

    register(spark)
    payload_dir = os.path.join(
        tempfile.gettempdir(),
        f"paged_sink_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    os.makedirs(payload_dir, exist_ok=True)
    payload = os.path.join(payload_dir, "documents.jsonl")
    (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "lang", "n_chars")
        .write.format("paged_json")
        .mode("overwrite")
        .option("path", payload)
        .save()
    )
    return (
        spark.read.format("paged_json")
        .schema("doc_id long, lang string, n_chars long")
        .option("path", payload)
        .option("pageSize", 100)
        .load()
    )


# --------------------------------------------------------------------------
# Prefix-filtering exact set-similarity join (PPJoin-family)
# --------------------------------------------------------------------------

_FILTERED_TOKS_SQL = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')"

_3GRAM_SQL = "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]"

#: naive uncapped exact-Jaccard oracle — an INDEPENDENT method (full
#: inverted index, no prefix filtering), so a green row proves the
#: prefix index is lossless, not merely self-consistent.
_PREFIX_JACCARD_SQL = f"""
WITH docs AS (
    SELECT doc_id, {_FILTERED_TOKS_SQL} AS toks FROM documents
),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> {_3GRAM_SQL}))) AS shingle
    FROM docs
),
counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM sh a JOIN sh b USING (shingle)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) AS jaccard
FROM inter
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.5
"""


@query("prefix_filter_jaccard", _PREFIX_JACCARD_SQL)
def q_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs via prefix filtering
    (operators/dedup.py:prefix_filter_jaccard_pairs) — the LOSSLESS
    complement to ngram_jaccard_pairs' doc_freq_cap prune: each doc
    indexes only its rarest |d|−⌈t·|d|⌉+1 shingles, which provably
    catches every pair with Jaccard ≥ t. The oracle is the naive
    uncapped inverted-index join (a different algorithm entirely), so
    the driver row certifies losslessness."""
    from dieter___etl___monarchmoney_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    docs = load_table(spark, "documents", sf_dir)
    return prefix_filter_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)


# --------------------------------------------------------------------------
# Bigram language-model quality score (perplexity-filter family)
# --------------------------------------------------------------------------

_BIGRAM_LM_SQL = f"""
WITH docs AS (
    SELECT doc_id, {_FILTERED_TOKS_SQL} AS toks FROM documents
),
big AS (
    SELECT doc_id,
           unnest(list_transform(
               generate_series(1, greatest(len(toks) - 1, 0)),
               i -> toks[i] || ' ' || toks[i+1])) AS bigram
    FROM docs
),
c1 AS (
    SELECT tok, COUNT(*) AS c1
    FROM (SELECT unnest(toks) AS tok FROM docs) GROUP BY tok
),
cb AS (SELECT bigram, COUNT(*) AS cb FROM big GROUP BY bigram),
v AS (SELECT COUNT(*) AS v FROM c1),
scored AS (
    SELECT b.doc_id,
           CAST(ln((cb.cb + 1) / CAST(c1.c1 + v.v AS DOUBLE)) AS DECIMAL(38,18)) AS lp
    FROM big b
    JOIN cb USING (bigram)
    JOIN c1 ON c1.tok = split_part(b.bigram, ' ', 1)
    CROSS JOIN v
),
agg AS (
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logp
    FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_bigrams, 0) AS n_bigrams,
       COALESCE(a.avg_logp, 0.0) AS avg_logp
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@query("bigram_lm_quality", _BIGRAM_LM_SQL)
def q_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical LM quality scoring (the CCNet/RefinedWeb
    perplexity-filter family, self-trained): an add-one-smoothed bigram
    model is fit on the corpus IN the engine — unigram counts, bigram
    counts, vocabulary size as a broadcast one-row aggregate — and each
    doc scores avg log p(w2|w1) over its bigrams; gibberish and
    boilerplate score low, fluent text high.

    Scale shape: two count shuffles (unigram, bigram) + one join of the
    doc bigram stream against both count tables (bigram-keyed shuffle;
    the unigram side is dim-sized per vocabulary and Catalyst/AQE may
    broadcast it), then one per-doc aggregate. Per-bigram log-probs are
    summed as DECIMAL(38,18) — float addition is not associative, so an
    exact-decimal sum keeps the per-doc score independent of Spark's
    aggregation order AND bit-reproducible in the oracle (same pattern
    as lloyd_refine / money_sum)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.array_remove(tokens("text"), "").alias("toks")
    )
    big = toks.select(
        "doc_id", F.explode_outer(shingles_of(F.col("toks"), 2)).alias("bigram")
    ).filter(F.col("bigram").isNotNull())
    unig = toks.select(F.explode("toks").alias("tok"))
    c1 = unig.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    cb = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    v = c1.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        big.join(cb, "bigram")
        .join(c1, F.substring_index(F.col("bigram"), " ", 1) == F.col("tok"))
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.log(
                (F.col("cb") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            )
            .cast("decimal(38,18)")
            .alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("lp").cast("double") / F.count(F.lit(1))).alias("avg_logp"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("avg_logp", F.lit(0.0)).alias("avg_logp"),
        )
    )


# --------------------------------------------------------------------------
# Fuzzy (edit-distance) dedup with blocking — the "typo dup" family
# --------------------------------------------------------------------------

_FUZZY_MAX_DIST = 4

_FUZZY_SQL = f"""
WITH blocked AS (
    SELECT p_partkey, p_name, p_brand,
           string_split_regex(lower(trim(p_name)), '\\s+')[1] AS first_tok
    FROM part
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_distance
FROM blocked a JOIN blocked b
  ON a.p_brand = b.p_brand AND a.first_tok = b.first_tok
 AND a.p_partkey < b.p_partkey
 AND abs(length(a.p_name) - length(b.p_name)) <= {_FUZZY_MAX_DIST}
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
ORDER BY id_a, id_b
"""


@query("fuzzy_name_dedup", _FUZZY_SQL)
def q_fuzzy_name_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs over part names: Levenshtein <= 4
    within (brand, first-token) blocks — the fuzzy-match family the
    shingle/minhash dedups can't express (those need token overlap; a
    3-char typo in a single-token name defeats them).

    Scale shape: NEVER an all-pairs product. The equi-join on the
    (p_brand, first_tok) block key is an ordinary shuffle join whose
    work is sum(block^2), not n^2, and the length-band predicate
    |len(a)-len(b)| <= d is join-condition-cheap and PROVABLY lossless
    (levenshtein >= length difference, so no pair with dist <= d is
    dropped) — the expensive O(len^2)-per-pair levenshtein only runs on
    survivors. At 100 TB you extend the block key (first 2 tokens, or a
    q-gram prefix a la prefix_filter_jaccard) to keep block^2 bounded;
    the lossless-band argument is unchanged."""
    parts = load_table(spark, "part", sf_dir)
    blocked = parts.select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.split(F.lower(F.trim(F.col("p_name"))), r"\s+")[0].alias("first_tok"),
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    joined = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.first_tok") == F.col("b.first_tok"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (
            F.abs(F.length(F.col("a.p_name")) - F.length(F.col("b.p_name")))
            <= _FUZZY_MAX_DIST
        ),
    )
    return (
        joined.withColumn(
            "edit_distance",
            # bounded levenshtein (3-arg): banded O(k*n) per pair, -1
            # past the threshold — kept rows carry the EXACT distance,
            # so the output values are unchanged and the -1 sentinel
            # rows are exactly the rows the old > threshold filter
            # dropped
            F.levenshtein(
                F.col("a.p_name"), F.col("b.p_name"), _FUZZY_MAX_DIST
            ).cast("int"),
        )
        .filter(F.col("edit_distance") >= 0)
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            "edit_distance",
        )
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# Embedding int8 scalar quantization + reconstruction-error audit
# --------------------------------------------------------------------------

_QUANT_SQL = """
WITH base AS (
    SELECT vec_id,
           CAST(length(embedding) AS INT) AS n_dims,
           CAST(list_min(embedding) AS DOUBLE) AS mn,
           CAST(list_max(embedding) AS DOUBLE) AS mx
    FROM embeddings
),
q AS (
    SELECT b.vec_id, b.n_dims, b.mn, b.mx,
           CASE WHEN b.mx = b.mn THEN CAST(0 AS BIGINT) ELSE CAST(list_sum(
               list_transform(e.embedding, (x, i) ->
                   CAST(i AS BIGINT) * LEAST(255, CAST(floor(
                       (CAST(x AS DOUBLE) - b.mn) * 256.0 / (b.mx - b.mn)
                   ) AS BIGINT)))
           ) AS BIGINT) END AS code_checksum,
           CASE WHEN b.mx = b.mn THEN 0.0 ELSE list_max(
               list_transform(e.embedding, x ->
                   abs(b.mn + (LEAST(255, CAST(floor(
                       (CAST(x AS DOUBLE) - b.mn) * 256.0 / (b.mx - b.mn)
                   ) AS BIGINT)) + 0.5) * ((b.mx - b.mn) / 256.0)
                       - CAST(x AS DOUBLE)))
           ) END AS max_abs_err
    FROM base b JOIN embeddings e USING (vec_id)
)
SELECT vec_id, n_dims, mn, mx, code_checksum, max_abs_err FROM q
"""


@query("embedding_quantization", _QUANT_SQL)
def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embeddings (per-vector min/max
    affine codes, the FAISS SQ8 shape) with an in-query reconstruction
    -error audit: code i = floor((x-mn)*256/(mx-mn)) clamped to 255,
    dequant = mn + (code+0.5)*scale. The full code vector is
    hash-checked via an order-pinned checksum sum(code_i * i); the
    audit column is the max absolute reconstruction error, bounded by
    scale/2 + float-representation noise (property-tested).

    Every operation is IEEE +,-,*,/ and floor on binary64 — all exactly
    specified, so both engines produce bit-identical codes and errors
    with NO rounding tolerance (unlike transcendental-based scores).
    Index convention: DuckDB's (x,i) lambda is 1-based, Spark's
    transform index is 0-based, so the Spark side uses i+1.

    Scale shape: embarrassingly parallel scan — zero shuffles, the
    quantized corpus is written partition-local at 4x compression,
    which is the point at 100 TB: ANN probes (ivf_ann_topk) then scan
    int8 codes, not float32."""
    vecs = load_table(spark, "embeddings", sf_dir)
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    base = vecs.select(
        "vec_id",
        "embedding",
        F.size("embedding").cast("int").alias("n_dims"),
        mn.alias("mn"),
        mx.alias("mx"),
    )

    def code(x):
        return F.least(
            F.lit(255).cast("bigint"),
            F.floor((x.cast("double") - F.col("mn")) * 256.0 / (F.col("mx") - F.col("mn"))),
        )

    checksum = F.aggregate(
        F.transform(F.col("embedding"), lambda x, i: (i + 1).cast("bigint") * code(x)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    err = F.array_max(
        F.transform(
            F.col("embedding"),
            lambda x: F.abs(
                F.col("mn")
                + (code(x) + 0.5) * ((F.col("mx") - F.col("mn")) / 256.0)
                - x.cast("double")
            ),
        )
    )
    degenerate = F.col("mx") == F.col("mn")
    return base.select(
        "vec_id",
        "n_dims",
        "mn",
        "mx",
        F.when(degenerate, F.lit(0).cast("bigint")).otherwise(checksum).alias(
            "code_checksum"
        ),
        F.when(degenerate, F.lit(0.0)).otherwise(err).alias("max_abs_err"),
    )


# --------------------------------------------------------------------------
# Tokenizer vocabulary construction: frequency-ranked IDs + OOV rate
# --------------------------------------------------------------------------

_VOCAB_MIN_COUNT = 5
_VOCAB_TOPK = 200

_VOCAB_SQL = f"""
WITH words AS (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
    FROM documents
),
counts AS (
    SELECT word, COUNT(*) AS freq FROM words WHERE word <> '' GROUP BY word
),
stats AS (
    SELECT CAST(SUM(freq) AS DOUBLE) AS total_occ,
           CAST(SUM(CASE WHEN freq >= {_VOCAB_MIN_COUNT} THEN freq ELSE 0 END)
                AS DOUBLE) AS covered_occ
    FROM counts
),
topv AS (
    SELECT word, freq FROM counts WHERE freq >= {_VOCAB_MIN_COUNT}
    ORDER BY freq DESC, word LIMIT {_VOCAB_TOPK}
)
SELECT t.word, CAST(t.freq AS BIGINT) AS freq,
       CAST(ROW_NUMBER() OVER (ORDER BY t.freq DESC, t.word) AS INT) AS vocab_id,
       1.0 - s.covered_occ / s.total_occ AS oov_rate
FROM topv t, stats s
ORDER BY vocab_id
"""


@query("vocab_id_assignment", _VOCAB_SQL)
def q_vocab_id_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary construction: corpus word frequencies,
    min-count {_VOCAB_MIN_COUNT} threshold, dense frequency-ranked IDs
    for the top {_VOCAB_TOPK} entries, and the corpus OOV rate (the
    fraction of token OCCURRENCES falling outside the vocabulary) as a
    constant audit column — the stats a BPE/WordPiece trainer needs
    before merges start.

    Scale shape: one word-count shuffle (map-side combinable); the
    global frequency rank is NOT a single-partition window over the
    vocabulary — the top-k is taken with orderBy().limit() (Take-
    OrderedAndProject: per-partition top-k then a k-row driver merge)
    and row_number runs over only those k finalists, so the funnel is
    bounded at k rows no matter the vocabulary size. The OOV stats are
    a 1-row aggregate broadcast onto the output."""
    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    stats = counts.agg(
        F.sum("freq").cast("double").alias("total_occ"),
        F.sum(
            F.when(F.col("freq") >= _VOCAB_MIN_COUNT, F.col("freq")).otherwise(0)
        )
        .cast("double")
        .alias("covered_occ"),
    )
    topv = (
        counts.filter(F.col("freq") >= _VOCAB_MIN_COUNT)
        .orderBy(F.col("freq").desc(), "word")
        .limit(_VOCAB_TOPK)
    )
    w = Window.orderBy(F.col("freq").desc(), "word")
    return (
        topv.withColumn("vocab_id", F.row_number().over(w).cast("int"))
        .crossJoin(F.broadcast(stats))
        .select(
            "word",
            F.col("freq").cast("bigint").alias("freq"),
            "vocab_id",
            (F.lit(1.0) - F.col("covered_occ") / F.col("total_occ")).alias("oov_rate"),
        )
        .orderBy("vocab_id")
    )


# --------------------------------------------------------------------------
# Similarity-graph triangle counting (graph analytics over the dup graph)
# --------------------------------------------------------------------------

#: shared shingle/posting CTE prefix for the graph-on-documents oracles —
#: identical semantics to operators/dedup.py's inverted index with the
#: parity-checked doc_freq<=64 stop-shingle guard.
_SHINGLE_EDGE_SQL = r"""
WITH docs AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\s+'),
                       t -> t <> '') AS toks
    FROM documents
),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
    FROM docs
),
counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
shfreq AS (SELECT shingle, COUNT(*) AS doc_freq FROM sh GROUP BY shingle),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM sh a JOIN sh b USING (shingle) JOIN shfreq USING (shingle)
    WHERE a.doc_id < b.doc_id AND shfreq.doc_freq <= 64
    GROUP BY 1, 2
)
"""

_TRIANGLE_SQL = (
    _SHINGLE_EDGE_SQL
    + """
, edges AS (
    SELECT doc_a, doc_b FROM inter
    JOIN counts ca ON ca.doc_id = doc_a JOIN counts cb ON cb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.5
),
tri AS (
    SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
    FROM edges e1
    JOIN edges e2 ON e1.doc_b = e2.doc_a
    JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
nodes AS (SELECT unnest([a, b, c]) AS doc_id FROM tri)
SELECT doc_id, COUNT(*) AS n_triangles
FROM nodes GROUP BY doc_id ORDER BY doc_id
"""
)


#: version tag for the shared near-dup edge materialization — bump when
#: the edge semantics (n, threshold, doc_freq_cap, schema) change so a
#: stale temp table can never satisfy a newer query.
_JACCARD_EDGE_TAG = "n3_t05_cap64_v1"


def shared_jaccard_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-Jaccard near-dup edge table ``(doc_a, doc_b, jaccard)``
    (3-gram shingles, threshold 0.5, doc_freq_cap 64), materialized to a
    per-sf parquet temp table on FIRST use and read from disk by every
    later consumer (`ngram_jaccard_pairs`, `similarity_graph_triangles`,
    `dup_graph_pagerank`).

    This is the production shape at 100 TB: the similarity join is the
    dominant cost of the whole dup-graph family, and a pipeline runs it
    ONCE into a materialized edge table that every downstream graph
    metric scans — never once per metric. In-session ``persist()`` can't
    provide this because the registry clears the cache between queries
    (registry.py docstring); parquet survives, and column pruning on the
    read means a `(doc_a, doc_b)` consumer never deserializes `jaccard`.
    Write is two-phase and the cache key folds in a size+mtime
    fingerprint of documents.parquet (sources/materialize.py) so a
    crashed run can't leave a half-written table and a REGENERATED
    corpus at the same path can't serve stale edges."""
    from dieter___etl___monarchmoney_spark.operators.dedup import ngram_jaccard_pairs
    from dieter___etl___monarchmoney_spark.sources.materialize import (
        shared_materialized,
    )

    return shared_materialized(
        spark,
        sf_dir,
        f"jaccard_edges_{_JACCARD_EDGE_TAG}",
        ("documents",),
        lambda: ngram_jaccard_pairs(
            load_table(spark, "documents", sf_dir),
            "text",
            "doc_id",
            n=3,
            threshold=0.5,
            doc_freq_cap=64,
        ),
    )


@query("similarity_graph_triangles", _TRIANGLE_SQL)
def q_similarity_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the exact-Jaccard near-dup graph —
    the graph-analytics primitive behind cluster-density auditing
    (a dup CLUSTER from connected components might be a chain of
    borderline pairs; triangles certify mutually-similar cores) and
    the standard first step of clustering-coefficient / community
    metrics.

    Scale shape: DEGREE-oriented enumeration. Each undirected edge is
    re-pointed from its lower-(degree, id) endpoint, wedges are built
    only on the orientation source with rank-ordered spokes, and the
    closure join probes the oriented edge between the two spoke ends —
    so every triangle is emitted exactly once from its minimum-rank
    vertex and wedge count is bounded by Σdeg^1.5 instead of the Σdeg²
    an id-oriented build pays when the graph has hubs (a boilerplate
    near-dup cluster IS a hub). The rank is the (degree, id) struct, so
    ties can't double- or zero-count. The edge set itself comes from
    the shared materialized near-dup table (`shared_jaccard_edges` —
    doc_freq-guarded inverted index, never all-pairs), built once per
    sf and scanned from parquet here."""
    edges = shared_jaccard_edges(spark, sf_dir).select("doc_a", "doc_b")
    return oriented_triangle_counts(edges)


def oriented_triangle_counts(edges: DataFrame) -> DataFrame:
    """Degree-oriented per-node triangle counts over an undirected,
    deduplicated edge list ``(doc_a, doc_b)`` with doc_a < doc_b.
    See q_similarity_graph_triangles for the algorithm contract; unit
    test pins it equal to brute-force enumeration on a hub graph."""
    deg = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .unionAll(edges.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = edges.join(
        deg.select(F.col("doc_id").alias("doc_a"), F.col("deg").alias("deg_a")),
        "doc_a",
    ).join(
        deg.select(F.col("doc_id").alias("doc_b"), F.col("deg").alias("deg_b")),
        "doc_b",
    )
    rank_a = F.struct(F.col("deg_a").alias("d"), F.col("doc_a").alias("i"))
    rank_b = F.struct(F.col("deg_b").alias("d"), F.col("doc_b").alias("i"))
    a_first = rank_a < rank_b  # struct comparison = lexicographic (deg, id)
    oriented = e.select(
        F.when(a_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias("src"),
        F.when(a_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias("dst"),
        F.when(a_first, rank_b).otherwise(rank_a).alias("dst_rank"),
        # the wedge+closure joins scan the oriented set three times;
        # persist so the degree join doesn't re-run per alias (the
        # edge SOURCE is already a cheap parquet scan)
    ).persist()
    o1, o2, o3 = oriented.alias("o1"), oriented.alias("o2"), oriented.alias("o3")
    tri = (
        o1.join(
            o2,
            (F.col("o1.src") == F.col("o2.src"))
            & (F.col("o1.dst_rank") < F.col("o2.dst_rank")),
        )
        .join(
            o3,
            (F.col("o3.src") == F.col("o1.dst"))
            & (F.col("o3.dst") == F.col("o2.dst")),
        )
        .select(
            F.col("o1.src").alias("a"),
            F.col("o1.dst").alias("b"),
            F.col("o2.dst").alias("c"),
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Containment dedup: document-subset detection (A's shingles ⊆ B's)
# --------------------------------------------------------------------------

_CONTAINMENT_SQL = (
    _SHINGLE_EDGE_SQL
    + """
, nsc AS (
    SELECT s.doc_id, COUNT(*) AS n_capped
    FROM sh s JOIN shfreq USING (shingle)
    WHERE doc_freq <= 64 GROUP BY s.doc_id
)
SELECT CASE WHEN i.n_inter = a.n_capped AND a.n_capped <= b.n_capped
            THEN i.doc_a ELSE i.doc_b END AS inner_doc,
       CASE WHEN i.n_inter = a.n_capped AND a.n_capped <= b.n_capped
            THEN i.doc_b ELSE i.doc_a END AS outer_doc,
       CAST(i.n_inter AS BIGINT) AS n_shared_shingles
FROM inter i
JOIN nsc a ON a.doc_id = i.doc_a
JOIN nsc b ON b.doc_id = i.doc_b
WHERE ((i.n_inter = a.n_capped AND a.n_capped <= b.n_capped)
    OR (i.n_inter = b.n_capped AND b.n_capped < a.n_capped))
  AND i.n_inter >= 3
ORDER BY inner_doc, outer_doc
"""
)


@query("containment_dedup_pairs", _CONTAINMENT_SQL)
def q_containment_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup: (inner, outer) pairs where the inner doc's
    entire (cap-surviving) shingle set appears in the outer doc — the
    quote/excerpt/boilerplate-wrapper duplication that symmetric
    Jaccard MISSES (a doc embedded in one 10x its size has Jaccard
    ~0.1, far under any dedup threshold, yet contributes zero novel
    text).

    Semantics are exact over the capped shingle space: containment :=
    n_inter == |capped shingles of inner| with >= 3 shingles of
    evidence; the doc_freq <= 64 stop-shingle guard (the bound that
    keeps posting-list self-joins sub-quadratic at 100 TB) is applied
    identically in both engines, so the guard is itself parity-checked
    — same discipline as ngram_jaccard_pairs.

    Scale shape: ONE shingle-keyed shuffle builds capped posting lists
    (the doc-frequency guard is just the list length — no separate
    frequency aggregate + join-back), persisted compactly so both
    consumers (per-doc capped counts, i<j pair intersections bounded by
    cap² per shingle) read it once — the shared posting table the whole
    dedup predicate family (Jaccard / containment / dup-fraction)
    materializes once in production. Local-bench note: the persist is
    WORK-optimal, not wall-optimal at demo scale — without it Spark
    recomputes the posting pipeline per consumer, which idle local
    cores hide; on a busy cluster total work is the cost that matters,
    so the materialization wins at 100 TB."""
    from dieter___etl___monarchmoney_spark.operators.dedup import _pair_combos

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.array_remove(tokens("text"), "").alias("toks")
    )
    sh = toks.select(
        "doc_id",
        F.explode(F.array_distinct(shingles_of(F.col("toks"), 3))).alias("shingle"),
    )
    # ONE shingle-keyed shuffle builds the capped posting lists; the
    # doc-frequency guard is simply the list length, so there is no
    # separate frequency aggregate + join-back. The compact posting
    # table (one row per shingle) is persisted and BOTH predicates
    # derive from it: per-doc capped counts from a posting explode,
    # pair intersections from the i<j combo explode (bounded by cap**2
    # per shingle). This is the shared posting table a production
    # pipeline materializes once for the whole dedup predicate family.
    postings = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") <= 64)
        .persist()
    )
    nsc = (
        postings.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_capped"))
    )
    inter = (
        postings.filter(F.size("ids") >= 2)
        .select(F.explode(_pair_combos(F.col("ids"))).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    joined = (
        inter.join(
            nsc.select(F.col("doc_id").alias("doc_a"), F.col("n_capped").alias("ca")),
            "doc_a",
        )
        .join(
            nsc.select(F.col("doc_id").alias("doc_b"), F.col("n_capped").alias("cb")),
            "doc_b",
        )
    )
    a_inner = (F.col("n_inter") == F.col("ca")) & (F.col("ca") <= F.col("cb"))
    b_inner = (F.col("n_inter") == F.col("cb")) & (F.col("cb") < F.col("ca"))
    return (
        joined.filter((a_inner | b_inner) & (F.col("n_inter") >= 3))
        .select(
            F.when(a_inner, F.col("doc_a")).otherwise(F.col("doc_b")).alias("inner_doc"),
            F.when(a_inner, F.col("doc_b")).otherwise(F.col("doc_a")).alias("outer_doc"),
            F.col("n_inter").cast("bigint").alias("n_shared_shingles"),
        )
        .orderBy("inner_doc", "outer_doc")
    )


# --------------------------------------------------------------------------
# BPE merge learning: iterative corpus-wide pair counting, in-engine
# --------------------------------------------------------------------------

_BPE_K = 3
_S = "\x1f"  # unit-separator sentinel: wraps every token, absent from text


def _bpe_stage_sql(k: int) -> str:
    """One unrolled BPE iteration: pair counts over stage k-1 strings →
    deterministic top merge → apply via sentinel-delimited replace."""
    prev = f"d{k - 1}"
    return f"""
p{k} AS (
    SELECT pr['l'] AS l, pr['r'] AS r, COUNT(*) AS cnt FROM (
        SELECT unnest(list_transform(
            generate_series(1, greatest(len(t) - 1, 0)),
            i -> {{'l': t[i], 'r': t[i+1]}})) AS pr
        FROM (SELECT string_split(trim(s, chr(31)), chr(31)||chr(31)) AS t
              FROM {prev})
    ) GROUP BY l, r
),
r{k} AS (
    SELECT {k} AS merge_rank, l, r, cnt FROM p{k}
    ORDER BY cnt DESC, l, r LIMIT 1
),
d{k} AS (
    SELECT doc_id,
           replace(s,
                   chr(31) || (SELECT l FROM r{k}) || chr(31) || chr(31)
                           || (SELECT r FROM r{k}) || chr(31),
                   chr(31) || (SELECT l || r FROM r{k}) || chr(31)) AS s
    FROM {prev}
)"""


_BPE_SQL = (
    """
WITH toks0 AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> t <> '') AS toks
    FROM documents
),
d0 AS (
    SELECT doc_id,
           chr(31) || array_to_string(toks, chr(31)||chr(31)) || chr(31) AS s
    FROM toks0 WHERE len(toks) > 0
),"""
    + ",".join(_bpe_stage_sql(k) for k in range(1, _BPE_K + 1))
    + """
SELECT merge_rank, l AS left_sym, r AS right_sym, CAST(cnt AS BIGINT) AS pair_count
FROM ("""
    + " UNION ALL ".join(f"SELECT * FROM r{k}" for k in range(1, _BPE_K + 1))
    + """)
ORDER BY merge_rank
"""
)


@query("bpe_merge_rules", _BPE_SQL)
def q_bpe_merge_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE (byte-pair-encoding) merge learning IN the engine: the first
    {K} tokenizer merges, each learned by a corpus-wide adjacent-pair
    count, a deterministic top-1 (count DESC, pair ASC), and a greedy
    left-to-right merge apply before the next round — the actual
    training loop of a BPE/WordPiece vocabulary, not just its
    frequency statistics (``vocab_id_assignment`` covers those).

    Representation: every token is wrapped in its own \\x1f sentinels
    (``␟tok␟``, adjacency = ``␟␟``), so the merge is ONE literal
    string replace — ``␟a␟␟b␟ → ␟ab␟`` — whose non-overlapping
    left-to-right semantics are exactly BPE's greedy apply, and
    consecutive pair occurrences (``a b a b``) all merge because each
    token carries its own delimiters. Both engines implement the
    identical loop (DuckDB: {K} unrolled CTE stages with scalar-
    subquery rules), so the oracle checks the LEARNED RULES of a
    stateful iterative algorithm, not a one-shot aggregate.

    Scale shape: each iteration is one pair-count shuffle (map-side
    combinable) + a 1-row driver collect (the rule — O(K) total driver
    data) + a scan-local string rewrite; the corpus is never shuffled
    for the apply. K iterations = K aggregate passes, the textbook BPE
    cost model; intermediate stages persist and are released once the
    rules are learned. The learned rules are materialized once per
    dataset (sources/materialize.py) — the tokenizer-training shape in
    production, where the vocabulary is trained once and every encode
    pass reads the published rules."""
    return shared_bpe_rules(spark, sf_dir).orderBy("merge_rank")


def shared_bpe_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge rules, materialized once per dataset
    fingerprint (two-phase write): ``bpe_merge_rules`` publishes them
    and ``bpe_encode_corpus`` applies them, so the K pair-count
    learning shuffles run once per corpus, not once per consumer —
    and learn/apply still share one implementation (``bpe_learn``),
    so they cannot drift."""
    from dieter___etl___monarchmoney_spark.sources.materialize import (
        shared_materialized,
    )

    def build() -> DataFrame:
        rules, final = bpe_learn(load_table(spark, "documents", sf_dir))
        final.unpersist()
        return spark.createDataFrame(
            rules,
            "merge_rank int, left_sym string, right_sym string, pair_count bigint",
        )

    return shared_materialized(
        spark, sf_dir, f"bpe_rules_k{_BPE_K}_v1", ("documents",), build
    )


def bpe_learn(docs: DataFrame, k_max: int = _BPE_K):
    """Run the BPE learning loop of ``q_bpe_merge_rules`` and return
    ``(rules, final_frame)`` where ``final_frame`` is the
    sentinel-wrapped corpus AFTER all merges applied (persisted —
    callers that don't consume it must unpersist). Shared with the
    encode pass (wave5_ops) so learn and apply can never drift."""
    toks = docs.select(
        "doc_id", F.array_remove(tokens("text"), "").alias("toks")
    )
    wrapped = toks.filter(F.size("toks") > 0).select(
        "doc_id",
        F.concat(
            F.lit(_S), F.array_join("toks", _S + _S), F.lit(_S)
        ).alias("s"),
    )
    cur = wrapped.persist()
    cached = [cur]
    rules = []
    for k in range(1, k_max + 1):
        arr = F.split(F.regexp_replace("s", "^\x1f+|\x1f+$", ""), "\x1f\x1f")
        n = F.size(arr)
        pairs = (
            cur.select(
                F.explode_outer(
                    F.arrays_zip(
                        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))).alias("l"),
                        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))).alias("r"),
                    )
                ).alias("pr")
            )
            .filter(F.col("pr").isNotNull())
            .select(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
        )
        top = (
            pairs.groupBy("l", "r")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:  # corpus of single-token docs: nothing left to merge
            break
        a, b, cnt = top[0].l, top[0].r, top[0].cnt
        rules.append((k, a, b, int(cnt)))
        cur = cur.select(
            "doc_id",
            F.replace(
                F.col("s"), F.lit(_S + a + _S + _S + b + _S), F.lit(_S + a + b + _S)
            ).alias("s"),
        ).persist()
        cached.append(cur)
    for frame in cached[:-1]:
        frame.unpersist()
    return rules, cached[-1]


# --------------------------------------------------------------------------
# Source keyness: log-likelihood ratio (G²) of word overuse per source
# --------------------------------------------------------------------------

_KEYNESS_SQL = """
WITH words AS (
    SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
    FROM documents
),
counts AS (
    SELECT source, word, COUNT(*) AS k1 FROM words WHERE word <> ''
    GROUP BY source, word
),
src_tot AS (SELECT source, SUM(k1) AS n1 FROM counts GROUP BY source),
word_tot AS (SELECT word, SUM(k1) AS k FROM counts GROUP BY word),
grand AS (SELECT SUM(k1) AS n FROM counts),
scored AS (
    SELECT c.source, c.word,
           CAST(c.k1 AS BIGINT) AS k1,
           CAST(w.k - c.k1 AS BIGINT) AS k2,
           ROUND(2.0 * (
               CASE WHEN c.k1 = 0 THEN 0.0
                    ELSE c.k1 * ln(c.k1 / (s.n1 * CAST(w.k AS DOUBLE) / g.n)) END
             + CASE WHEN w.k - c.k1 = 0 THEN 0.0
                    ELSE (w.k - c.k1)
                         * ln((w.k - c.k1) / ((g.n - s.n1) * CAST(w.k AS DOUBLE) / g.n)) END
           ), 3) AS g2,
           (c.k1 * CAST(g.n AS DOUBLE) > CAST(w.k AS DOUBLE) * s.n1) AS overused
    FROM counts c
    JOIN src_tot s USING (source)
    JOIN word_tot w USING (word)
    CROSS JOIN grand g
    WHERE c.k1 >= 5
)
SELECT source, word, k1, k2, g2, overused, CAST(rnk AS INT) AS rnk FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY g2 DESC, word
    ) AS rnk FROM scored WHERE overused
) WHERE rnk <= 10
ORDER BY source, rnk
"""


@query("source_keyness_g2", _KEYNESS_SQL)
def q_source_keyness_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyness: the top-10 OVERUSED words per source by log-likelihood
    ratio (Dunning's G²) against the rest of the corpus — the corpus-
    linguistics contrast statistic behind "what characterizes this
    source" audits and domain-signature features.

    Determinism: the G² terms use ``ln`` (transcendental, up to 1 ulp
    apart between libm and the JVM), so the statistic is ROUNDED to 3dp
    BEFORE ranking — both engines then rank identical values with the
    word tie-break, and a 1-ulp wobble can neither reorder the top-10
    nor flake the hash. Counts and margins are exact integers.

    Scale shape: one word-count shuffle; source margins (|sources|
    rows) and the grand total (1 row) broadcast; the word-margin join
    is vocabulary-sized. The per-source top-10 compiles to
    WindowGroupLimit (rank pushed into the window operator), so each
    partition emits at most 10 survivors before the final sort."""
    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    counts = words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("k1"))
    src_tot = counts.groupBy("source").agg(F.sum("k1").alias("n1"))
    word_tot = counts.groupBy("word").agg(F.sum("k1").alias("k"))
    grand = counts.agg(F.sum("k1").alias("n"))

    def term(x, e):
        return F.when(x == 0, F.lit(0.0)).otherwise(
            x.cast("double") * F.log(x.cast("double") / e)
        )

    k2 = F.col("k") - F.col("k1")
    e1 = F.col("n1") * F.col("k").cast("double") / F.col("n")
    e2 = (F.col("n") - F.col("n1")) * F.col("k").cast("double") / F.col("n")
    scored = (
        counts.filter(F.col("k1") >= 5)
        .join(F.broadcast(src_tot), "source")
        .join(word_tot, "word")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "word",
            F.col("k1").cast("bigint").alias("k1"),
            k2.cast("bigint").alias("k2"),
            F.round(2.0 * (term(F.col("k1"), e1) + term(k2, e2)), 3).alias("g2"),
            (
                F.col("k1") * F.col("n").cast("double")
                > F.col("k").cast("double") * F.col("n1")
            ).alias("overused"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("g2").desc(), "word")
    return (
        scored.filter(F.col("overused"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 10)
        .orderBy("source", "rnk")
    )


# --------------------------------------------------------------------------
# PageRank (fixed 3 iterations) over the near-dup similarity graph
# --------------------------------------------------------------------------

_PR_D = 0.85
_PR_ITERS = 3


def _pr_stage_sql(k: int) -> str:
    """One unrolled PageRank iteration: every node's next score is
    (1-d)/N + d * sum of neighbor score/degree contributions, each
    contribution cast to exact DECIMAL before SUM."""
    prev = f"pr{k - 1}"
    return f"""
pr{k} AS (
    SELECT v.node,
           (1.0 - {_PR_D}) / (SELECT n_nodes FROM meta)
           + {_PR_D} * CAST(COALESCE(SUM(
                 CAST(p.score / CAST(deg.degree AS DOUBLE) AS DECIMAL(38,18))
             ), 0) AS DOUBLE) AS score
    FROM vertices v
    LEFT JOIN sym e ON e.dst = v.node
    LEFT JOIN {prev} p ON p.node = e.src
    LEFT JOIN degrees deg ON deg.node = e.src
    GROUP BY v.node
)"""


_PAGERANK_SQL = (
    _SHINGLE_EDGE_SQL
    + f"""
, edges AS (
    SELECT doc_a, doc_b FROM inter
    JOIN counts ca ON ca.doc_id = doc_a JOIN counts cb ON cb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.5
),
sym AS (
    SELECT doc_a AS src, doc_b AS dst FROM edges
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM edges
),
vertices AS (SELECT DISTINCT src AS node FROM sym),
degrees AS (SELECT src AS node, COUNT(*) AS degree FROM sym GROUP BY src),
meta AS (SELECT COUNT(*) AS n_nodes FROM vertices),
pr0 AS (
    SELECT node, 1.0 / (SELECT n_nodes FROM meta) AS score FROM vertices
),"""
    + ",".join(_pr_stage_sql(k) for k in range(1, _PR_ITERS + 1))
    + f"""
SELECT node AS doc_id, ROUND(score, 9) AS pagerank
FROM pr{_PR_ITERS}
ORDER BY doc_id
"""
)


@query("dup_graph_pagerank", _PAGERANK_SQL)
def q_dup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {K} fixed iterations) over the
    symmetrized near-dup similarity graph — centrality inside dup
    clusters identifies the "hub" document every other near-copy
    orbits, a better canonical-survivor signal than quality score
    alone when clusters are star-shaped (one original, many partial
    copies).

    Iterative-algorithm parity, like bpe_merge_rules: the oracle
    unrolls the same {K} power iterations as CTE stages. Per-node
    message sums cast each neighbor contribution to DECIMAL(38,18)
    before SUM, so Spark's aggregation order cannot flake the hash;
    the per-contribution score/degree division is IEEE on identical
    doubles. Scores round to 9dp at the output edge.

    Scale shape: each iteration is one join of the score vector
    against the edge list + one grouped sum — the standard distributed
    PageRank step, state O(V), messages O(E), never adjacency-
    materialized beyond the edge list. Fixed iteration count keeps the
    plan static (no driver-side convergence loop; neardup_clusters
    shows the converging variant with 2-hop checkpointing). The edge
    list reads from the shared materialized near-dup table
    (`shared_jaccard_edges`), so the similarity join runs once per sf
    across the whole dup-graph family — the iteration loop scans
    parquet, not a recomputed similarity pipeline."""
    edges = shared_jaccard_edges(spark, sf_dir).select("doc_a", "doc_b").persist()
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    vertices = sym.select(F.col("src").alias("node")).distinct().persist()
    degrees = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    n_nodes = vertices.count()  # bounded: similarity-graph vertices only
    scores = vertices.select("node", (F.lit(1.0) / n_nodes).alias("score"))
    messages_base = sym.join(
        degrees.withColumnRenamed("node", "src"), "src"
    ).persist()
    for _ in range(_PR_ITERS):
        contrib = (
            messages_base.join(scores.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("score") / F.col("degree").cast("double"))
                .cast("decimal(38,18)")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        scores = vertices.join(contrib, "node", "left").select(
            "node",
            (
                F.lit((1.0 - _PR_D) / n_nodes)
                + F.lit(_PR_D) * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            ).alias("score"),
        )
    result = scores.select(
        F.col("node").alias("doc_id"), F.round("score", 9).alias("pagerank")
    ).orderBy("doc_id")
    return result


# --------------------------------------------------------------------------
# Entity resolution: fuzzy pairs → components → canonical survivor record
# --------------------------------------------------------------------------

#: entity-resolution match radius — deliberately TIGHTER than the
#: dedup query's {_FUZZY_MAX_DIST}: dedup optimizes recall (a missed
#: near-dup costs training quality), ER optimizes precision (a false
#: merge corrupts the canonical record and chain-merges entities).
_ER_MAX_DIST = 2

_ER_SQL = f"""
WITH RECURSIVE blocked AS (
    SELECT p_partkey, p_name, p_brand,
           string_split_regex(lower(trim(p_name)), '\\s+')[1] AS first_tok
    FROM part
),
fpairs AS (
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
    FROM blocked a JOIN blocked b
      ON a.p_brand = b.p_brand AND a.first_tok = b.first_tok
     AND a.p_partkey < b.p_partkey
     AND abs(length(a.p_name) - length(b.p_name)) <= {_ER_MAX_DIST}
    WHERE levenshtein(a.p_name, b.p_name) <= {_ER_MAX_DIST}
),
edges AS (
    SELECT id_a AS v, id_b AS u FROM fpairs
    UNION ALL SELECT id_b, id_a FROM fpairs
),
reach(v, u) AS (
    SELECT p_partkey, p_partkey FROM part
    UNION
    SELECT r.v, e.u FROM reach r JOIN edges e ON r.u = e.v
),
labels AS (SELECT v AS p_partkey, MIN(u) AS entity_id FROM reach GROUP BY v),
groups AS (
    SELECT entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           array_to_string(list_sort(list(p_partkey)), ',') AS member_ids
    FROM labels GROUP BY entity_id
    HAVING COUNT(*) >= 2
)
SELECT g.entity_id, g.n_members, g.member_ids, p.p_name AS canonical_name
FROM groups g JOIN part p ON p.p_partkey = g.entity_id
ORDER BY g.entity_id
"""


@query("fuzzy_entity_resolution", _ER_SQL)
def q_fuzzy_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocked Levenshtein match pairs →
    connected components → one canonical record per entity (min-id
    survivor carries its name, members ride as a sorted id list) —
    the master-data shape behind merchant/vendor/product
    canonicalization, composed entirely from operators already proven
    separately (fuzzy_name_dedup's lossless blocking,
    neardup_clusters' adaptive union-find).

    The oracle recomputes the SAME pipeline relationally, with DuckDB's
    recursive CTE playing transitive closure against Spark's min-label
    propagation — two different algorithms agreeing on every entity,
    its size, and its full member list.

    Scale shape: inherits each stage's contract — Σblock² match
    pairs, component state O(matched vertices) (the entity graph,
    orders of magnitude smaller than the catalog), canonical join
    dim-sized."""
    from dieter___etl___monarchmoney_spark.operators.dedup import neardup_clusters

    parts = load_table(spark, "part", sf_dir)
    blocked = parts.select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.split(F.lower(F.trim(F.col("p_name"))), r"\s+")[0].alias("first_tok"),
    )
    a_side = blocked.alias("fa")
    b_side = blocked.alias("fb")
    pairs = (
        a_side.join(
            b_side,
            (F.col("fa.p_brand") == F.col("fb.p_brand"))
            & (F.col("fa.first_tok") == F.col("fb.first_tok"))
            & (F.col("fa.p_partkey") < F.col("fb.p_partkey"))
            & (
                F.abs(F.length(F.col("fa.p_name")) - F.length(F.col("fb.p_name")))
                <= _ER_MAX_DIST
            ),
        )
        .filter(
            # bounded (banded) levenshtein: the 3-arg form computes a
            # 2k+1 diagonal band and returns -1 past the threshold —
            # O(k*n) per pair instead of O(n^2), identical keep-set
            # (dist <= k  <=>  bounded-dist != -1). On the dense match
            # graph here (~470k pairs of ~2M block candidates at
            # sf0.1) the distance evaluation is the scan's hot loop.
            F.levenshtein(F.col("fa.p_name"), F.col("fb.p_name"), _ER_MAX_DIST)
            >= 0
        )
        .select(
            F.col("fa.p_partkey").alias("doc_a"), F.col("fb.p_partkey").alias("doc_b")
        )
    )
    # TPC-H-ish part names are short color tuples, so the match graph is
    # dense (~470k pairs at sf0.1): past the adaptive threshold, the
    # counted edge list routes to the DISTRIBUTED min-label path — both
    # paths measure ~equal wall here, which is exactly the crossover
    # the threshold encodes.
    labels = neardup_clusters(parts, pairs, "p_partkey").withColumnRenamed(
        "cluster_id", "entity_id"
    )
    groups = (
        labels.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.array_join(F.sort_array(F.collect_list("p_partkey")), ",").alias(
                "member_ids"
            ),
        )
        .filter(F.col("n_members") >= 2)
    )
    canonical = parts.select(
        F.col("p_partkey").alias("entity_id"), F.col("p_name").alias("canonical_name")
    )
    return (
        groups.join(canonical, "entity_id")
        .select("entity_id", "n_members", "member_ids", "canonical_name")
        .orderBy("entity_id")
    )
