"""Round-3 wave-6 operators: banded SimHash pair search, collocation
mining, mixture-weight planning, and binned drift (PSI).

- ``simhash_hamming_pairs``: near-dup pairs within hamming distance 3
  of the 32-bit SimHash via the Manku/Jain/Sarma block rotation —
  the hamming>0 search that ``simhash_buckets`` (hamming-0) defers to.
- ``pmi_collocations``: top adjacent-bigram collocations by pointwise
  mutual information — the classic phrase/term-mining statistic over a
  corpus (high PMI ⇒ the pair co-occurs far above chance).
- ``temperature_mixture_weights``: LLaMA/Pile-style source mixing
  weights w_i ∝ n_i^(1/T) with T=2 (√-scaling): a tiny per-source
  aggregate that decides how many expected epochs each source
  contributes to one pass of the mixed corpus.
- ``psi_value_drift``: Population Stability Index of ``events.value``
  between the first and second half of the window, binned by exact
  reference-period deciles — the industry-standard binned drift screen
  complementing the KS / Mann-Whitney / Jensen-Shannon family.

Reference framing: the reference engine (aiohttp GraphQL ETL,
monarchmoney/monarchmoney.py) has none of these; they extend the
large-scale-pipeline family of SURVEY.md §6.

Determinism notes: PMI's ln() takes exact-integer-derived doubles (both
engines agree; precedent: source_keyness_g2, source_divergence_matrix);
the mixture temperature is T=2 because sqrt() is IEEE-correctly-rounded
in both engines while pow(x, 0.3) is not guaranteed to be; PSI bin
edges reuse the proven percentile == quantile_cont equivalence
(percentile_stats_by_lang). Transcendental outputs round at 9dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.operators.dedup import simhash_hamming_pairs
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table
from dieter___etl___monarchmoney_spark.functions.text import tokens
from dieter___etl___monarchmoney_spark.queries.llm_pipeline import (
    _hexparse_sql,
    _TOKS_SQL,
)

# --------------------------------------------------------------------------
# SimHash hamming<=3 pair search (banded, never all-pairs)
# --------------------------------------------------------------------------

#: identical CTE chain to _SIMHASH_SQL in llm_pipeline.py up to `sigs`,
#: then the 4-block rotation: blocks -> cap-filter -> band self-join ->
#: exact bit_count(xor) verification, mirroring operators/dedup.py
#: simhash_hamming_pairs block for block.
_SIMHASH_PAIRS_SQL = f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
    hs AS (SELECT doc_id, {_hexparse_sql("substr(md5(tok), 1, 8)")} AS h FROM toks),
    votes AS (
        SELECT doc_id,
               {', '.join(f"SUM(CASE WHEN (h & {1 << i}) != 0 THEN 1 ELSE -1 END) AS v{i}" for i in range(32))}
        FROM hs GROUP BY doc_id
    ),
    sigs AS (
        SELECT doc_id,
               ({' + '.join(f"CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END" for i in range(32))})
                   AS simhash
        FROM votes
    ),
    blocks AS (
        SELECT doc_id, simhash, bi,
               CAST((simhash >> (8 * bi)) & 255 AS BIGINT) AS bv
        FROM sigs, (VALUES (0), (1), (2), (3)) t(bi)
    ),
    ok AS (SELECT bi, bv FROM blocks GROUP BY bi, bv HAVING COUNT(*) <= 256),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sa, b.simhash AS sb
        FROM blocks a
        JOIN ok USING (bi, bv)
        JOIN blocks b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
"""


@query("simhash_hamming_pairs", _SIMHASH_PAIRS_SQL)
def q_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming≤3 SimHash near-dup pairs via 4-block pigeonhole banding
    (see operators/dedup.py:simhash_hamming_pairs for the scale
    argument). Bucket cap 256 is mirrored in the oracle's `ok` CTE."""
    docs = load_table(spark, "documents", sf_dir)
    return simhash_hamming_pairs(docs, "text", "doc_id", max_hamming=3, bucket_cap=256)


# --------------------------------------------------------------------------
# PMI collocations (adjacent-bigram pointwise mutual information)
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOPK = 50

_PMI_SQL = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter({_TOKS_SQL}, x -> x <> '') AS t
        FROM documents
    ),
    ucnt AS (
        SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ),
    big AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM toks, unnest(range(1, len(t))) r(i)
        WHERE len(t) >= 2
    ),
    bcnt AS (SELECT w1, w2, COUNT(*) AS c_ab FROM big GROUP BY w1, w2),
    tot AS (
        SELECT CAST(SUM(len(t)) AS DOUBLE) AS nu,
               CAST(SUM(CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END) AS DOUBLE) AS nb
        FROM toks
    )
    SELECT b.w1, b.w2, b.c_ab,
           ROUND(LN((CAST(b.c_ab AS DOUBLE) / tot.nb)
                    / ((CAST(ua.c AS DOUBLE) / tot.nu)
                       * (CAST(ub.c AS DOUBLE) / tot.nu))), 9) AS pmi
    FROM bcnt b
    JOIN ucnt ua ON ua.w = b.w1
    JOIN ucnt ub ON ub.w = b.w2
    CROSS JOIN tot
    WHERE b.c_ab >= {_PMI_MIN_COUNT}
    ORDER BY pmi DESC, b.w1, b.w2
    LIMIT {_PMI_TOPK}
"""


@query("pmi_collocations", _PMI_SQL)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} adjacent-bigram collocations by PMI = ln(p(ab) /
    (p(a)·p(b))) with a min-count support filter.

    Scale shape: ONE explode each for bigrams and unigrams, both
    map-side-combinable counts; the two unigram joins key on the word
    (vocabulary-sized, Zipf-bounded — at 100 TB the unigram table still
    fits comfortably in a shuffle, and the support filter prunes the
    bigram table before either join). Corpus totals ride along as a
    broadcast 1-row frame; ties on pmi break on (w1, w2) so the top-k
    is a total order. All ln() inputs derive from exact integers.
    """
    docs = load_table(spark, "documents", sf_dir)
    # NOT persisted: the caller owns the returned (lazy) frame, so an
    # unpersist here would run before materialization and a persist
    # without one leaks a corpus-sized cache in a long-lived session
    # (the driver rotation runs hundreds of queries in one JVM). The
    # three consumers below each re-tokenize — a single extra scan-speed
    # pass — which at 100 TB is cheaper than pinning the tokenized
    # corpus in executor memory.
    t = docs.select(F.array_remove(tokens("text"), "").alias("t"))
    uni = t.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    big = (
        t.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice(F.col("t"), 2, F.size("t") - 1),
                )
            ).alias("p")
        )
        .select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    tot = t.agg(
        F.sum(F.size("t")).cast("double").alias("nu"),
        F.sum(
            F.when(F.size("t") >= 2, F.size("t") - 1).otherwise(F.lit(0))
        )
        .cast("double")
        .alias("nb"),
    )
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    pmi = F.round(
        F.log(
            (F.col("c_ab").cast("double") / F.col("nb"))
            / (
                (F.col("c_a").cast("double") / F.col("nu"))
                * (F.col("c_b").cast("double") / F.col("nu"))
            )
        ),
        9,
    )
    return (
        big.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(_PMI_TOPK)
    )


# --------------------------------------------------------------------------
# Temperature-scaled mixture weights
# --------------------------------------------------------------------------

_MIXW_SQL = """
    WITH src AS (
        SELECT source,
               CAST(SUM(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                        x -> x <> ''))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    w AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS w_raw FROM src),
    tot AS (SELECT SUM(w_raw) AS sw, CAST(SUM(n_tokens) AS DOUBLE) AS tn FROM w)
    SELECT w.source, w.n_tokens,
           ROUND(w.w_raw / tot.sw, 9) AS weight,
           ROUND(w.w_raw / tot.sw * tot.tn, 4) AS expected_tokens,
           ROUND(w.w_raw / tot.sw * tot.tn / CAST(w.n_tokens AS DOUBLE), 9) AS epochs
    FROM w CROSS JOIN tot
"""


@query("temperature_mixture_weights", _MIXW_SQL)
def q_temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source mixing weights w_i ∝ n_i^(1/T), T=2 — the
    temperature-scaled sampling that up-weights small sources relative
    to proportional sampling (multilingual-BERT / XLM-R exponent
    sampling; complements source_mixture_sample's hard cap).
    ``epochs`` is how many passes over source i one epoch of the mixed
    corpus implies (>1 ⇒ the source repeats).

    Scale shape: one map-side-combinable per-source aggregate
    (#sources rows) plus a broadcast 1-row total — the corpus is read
    once and never shuffled. T=2 (sqrt) keeps the transcendental edge
    IEEE-exact in both engines (pow's last-ulp is platform-dependent;
    sqrt is correctly rounded everywhere).
    """
    docs = load_table(spark, "documents", sf_dir)
    # token_count counts '' for empty docs too — mirror the oracle's
    # list_filter by counting only non-empty whitespace tokens.
    n_tok = F.size(F.array_remove(tokens("text"), ""))
    src = docs.groupBy("source").agg(F.sum(n_tok).cast("bigint").alias("n_tokens"))
    w = src.select(
        "source", "n_tokens", F.sqrt(F.col("n_tokens").cast("double")).alias("w_raw")
    )
    tot = w.agg(
        F.sum("w_raw").alias("sw"), F.sum("n_tokens").cast("double").alias("tn")
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.round(F.col("w_raw") / F.col("sw"), 9).alias("weight"),
        F.round(F.col("w_raw") / F.col("sw") * F.col("tn"), 4).alias("expected_tokens"),
        F.round(
            F.col("w_raw") / F.col("sw") * F.col("tn") / F.col("n_tokens").cast("double"),
            9,
        ).alias("epochs"),
    )


# --------------------------------------------------------------------------
# PSI drift (binned Population Stability Index)
# --------------------------------------------------------------------------

#: fixed half-window split of the 30-day synthetic event range
_PSI_SPLIT = "2024-01-16"
_PSI_EPS = 1e-6

_PSI_SQL = f"""
    WITH ref AS (SELECT value FROM events WHERE ts < TIMESTAMP '{_PSI_SPLIT}'),
    edges AS (
        SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS es
        FROM ref
    ),
    binned AS (
        SELECT CASE WHEN e.ts < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref,
               CAST(len(list_filter(edges.es, x -> e.value >= x)) AS INT) AS bin
        FROM events e CROSS JOIN edges
    ),
    cnt AS (
        SELECT bin,
               SUM(is_ref) AS p_cnt,
               SUM(1 - is_ref) AS q_cnt
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT CAST(SUM(p_cnt) AS DOUBLE) AS pn, CAST(SUM(q_cnt) AS DOUBLE) AS qn FROM cnt)
    SELECT bin,
           CAST(p_cnt AS BIGINT) AS p_cnt,
           CAST(q_cnt AS BIGINT) AS q_cnt,
           ROUND(p_cnt / tot.pn, 9) AS p_frac,
           ROUND(q_cnt / tot.qn, 9) AS q_frac,
           ROUND((GREATEST(q_cnt / tot.qn, {_PSI_EPS}) - GREATEST(p_cnt / tot.pn, {_PSI_EPS}))
                 * LN(GREATEST(q_cnt / tot.qn, {_PSI_EPS})
                      / GREATEST(p_cnt / tot.pn, {_PSI_EPS})), 9) AS psi_term
    FROM cnt CROSS JOIN tot
"""


@query("psi_value_drift", _PSI_SQL)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of event values, first half-window
    (reference) vs second (current), binned by exact reference deciles.
    PSI = Σ (q_i − p_i)·ln(q_i/p_i); |PSI| > 0.2 is the classic
    "distribution moved, retrain/investigate" alarm. Completes the
    drift family (KS = max-CDF-gap, MWU = rank shift, JS = vocabulary
    shift) with the binned production-monitoring form.

    Scale shape: decile edges are ONE exact percentile aggregate over
    the reference slice (swap percentile_approx at 100 TB — noted, kept
    exact for the oracle hash), broadcast back as a 1-row array; bin
    assignment is per-row arithmetic on the scan, and the final
    aggregate is 10 groups with map-side partials. The epsilon guard
    keeps ln() finite for empty bins and is mirrored in the oracle.
    """
    ev = load_table(spark, "events", sf_dir).select("ts", "value")
    split = F.lit(_PSI_SPLIT).cast("timestamp")
    edges = (
        ev.filter(F.col("ts") < split)
        .agg(
            F.percentile(
                "value", F.array(*[F.lit(p / 10.0) for p in range(1, 10)])
            ).alias("es")
        )
    )
    # bin = |edges ≤ value| — UNROLLED into 9 codegen'd element_at
    # comparisons (round 12): size(filter(..., lambda)) is a
    # higher-order function, which is CodegenFallback (interpreted per
    # element) on the full fact scan. when/otherwise counts exactly
    # like filter() — a NULL comparison (NULL value) contributes 0 —
    # and the whole-NULL edge array (empty reference slice) still
    # yields a NULL bin, matching size(NULL)=NULL.
    n_edges = 9
    bin_col = F.lit(0)
    for i in range(1, n_edges + 1):
        bin_col = bin_col + F.when(
            F.col("value") >= F.element_at("es", i), 1
        ).otherwise(0)
    binned = ev.crossJoin(F.broadcast(edges)).select(
        F.when(F.col("ts") < split, 1).otherwise(0).alias("is_ref"),
        F.when(F.col("es").isNull(), F.lit(None).cast("int"))
        .otherwise(bin_col)
        .cast("int")
        .alias("bin"),
    )
    cnt = binned.groupBy("bin").agg(
        F.sum("is_ref").alias("p_cnt"), F.sum(1 - F.col("is_ref")).alias("q_cnt")
    )
    tot = cnt.agg(
        F.sum("p_cnt").cast("double").alias("pn"),
        F.sum("q_cnt").cast("double").alias("qn"),
    )
    p = F.greatest(F.col("p_cnt") / F.col("pn"), F.lit(_PSI_EPS))
    q = F.greatest(F.col("q_cnt") / F.col("qn"), F.lit(_PSI_EPS))
    return cnt.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("p_cnt").cast("bigint").alias("p_cnt"),
        F.col("q_cnt").cast("bigint").alias("q_cnt"),
        F.round(F.col("p_cnt") / F.col("pn"), 9).alias("p_frac"),
        F.round(F.col("q_cnt") / F.col("qn"), 9).alias("q_frac"),
        F.round((q - p) * F.log(q / p), 9).alias("psi_term"),
    )
