"""Round-3 wave-5 operators: tokenizer application, robust time-series
statistics, a forensic digit audit, and lake-maintenance planning.

- ``bpe_encode_corpus``: APPLY the BPE merges learned in-engine by
  ``bpe_merge_rules`` to every document — learn → encode is the full
  tokenizer loop, and the encoded stream is fingerprint-checked.
- ``ewma_smoothing``: exponentially-weighted moving average per event
  series — a RECURSIVE statistic (each value depends on the previous
  smoothed value) expressed as a deterministic in-engine fold, with a
  recursive-CTE oracle.
- ``mad_outliers``: median/MAD robust outlier detection on daily
  series — the heavy-tail-safe complement of value_outliers_zscore.
- ``benford_digit_audit``: first-significant-digit distribution vs
  Benford's law with a chi-squared statistic — the classic forensic
  data-quality screen for fabricated or truncated numeric feeds.
- ``compaction_bin_packing``: small-files compaction planner — pack
  date partitions into target-size bins via sorted prefix-sum
  assignment and audit the fill ratio (the lake-maintenance step every
  100 TB table needs between ingest and query).

Reference framing: the reference engine (API-bound single-node ETL)
has none of these; they extend SURVEY.md §6's large-scale-pipeline
family (tokenization, series hygiene, data forensics, layout
maintenance).

Determinism contract as elsewhere: exact DECIMAL sums before any
double division, per-term DECIMAL(38,18) casts for transcendental or
cross-row float sums, 9dp rounding at transcendental edges, exact
integer/string derivations for keys and digits.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table
from dieter___etl___monarchmoney_spark.functions.text import tokens
from dieter___etl___monarchmoney_spark.queries.corpus_ops import (
    _BPE_K,
    _bpe_stage_sql,
)

_DEC18 = "decimal(38,18)"

# --------------------------------------------------------------------------
# BPE encode: apply the learned merges to the corpus
# --------------------------------------------------------------------------

_ENCODE_SQL = (
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
    + f"""
, enc AS (
    SELECT doc_id,
           string_split(trim(s, chr(31)), chr(31)||chr(31)) AS syms
    FROM d{_BPE_K}
)
SELECT t.doc_id,
       CAST(len(t.toks) AS INT) AS n_syms_before,
       CAST(COALESCE(len(e.syms), 0) AS INT) AS n_syms_after,
       CAST(len(t.toks) - COALESCE(len(e.syms), 0) AS INT) AS n_merges_applied,
       COALESCE(md5(array_to_string(e.syms, ' ')), md5('')) AS encoded_fp
FROM toks0 t LEFT JOIN enc e USING (doc_id)
ORDER BY doc_id
"""
)


@query("bpe_encode_corpus", _ENCODE_SQL)
def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode every document with the BPE merges
    learned in-engine (the same ``bpe_learn`` loop as
    ``bpe_merge_rules`` — learn and apply share one implementation so
    they cannot drift). Per doc: symbol count before and after the
    merges, how many merges fired, and the md5 fingerprint of the final
    symbol stream — the fingerprint proves the ENCODED OUTPUT matches
    the oracle's unrolled-CTE encoder symbol for symbol, not just the
    counts.

    Scale shape: the rules come from the shared materialized table
    (learned ONCE per corpus by ``bpe_merge_rules``'s ``bpe_learn``,
    collected here as ≤K driver rows); encoding is a pure scan-local
    string rewrite — the corpus is never shuffled to encode, which is
    why BPE apply parallelizes perfectly at 100 TB (each executor
    rewrites its partitions against the broadcast rule list). The
    count/fingerprint audit here adds one doc_id-keyed join back to
    the token counts."""
    from dieter___etl___monarchmoney_spark.queries.corpus_ops import (
        shared_bpe_rules,
    )

    docs = load_table(spark, "documents", sf_dir)
    rules = shared_bpe_rules(spark, sf_dir).orderBy("merge_rank").collect()
    _S = "\x1f"
    toks_col = F.array_remove(tokens("text"), "")
    final = (
        docs.select("doc_id", toks_col.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            F.concat(F.lit(_S), F.array_join("toks", _S + _S), F.lit(_S)).alias("s"),
        )
    )
    # the same greedy left-to-right apply as bpe_learn's loop, replayed
    # from the published rules in merge order — map-only per partition
    for r in rules:
        final = final.select(
            "doc_id",
            F.replace(
                F.col("s"),
                F.lit(_S + r.left_sym + _S + _S + r.right_sym + _S),
                F.lit(_S + r.left_sym + r.right_sym + _S),
            ).alias("s"),
        )
    syms = F.split(F.regexp_replace("s", "^\x1f+|\x1f+$", ""), "\x1f\x1f")
    enc = final.select(
        "doc_id",
        F.size(syms).alias("n_syms_after"),
        F.md5(F.array_join(syms, " ")).alias("encoded_fp"),
    )
    before = docs.select(
        "doc_id",
        F.size(F.array_remove(tokens("text"), "")).alias("n_syms_before"),
    )
    return (
        before.join(enc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_syms_before").cast("int").alias("n_syms_before"),
            F.coalesce("n_syms_after", F.lit(0)).cast("int").alias("n_syms_after"),
            (F.col("n_syms_before") - F.coalesce("n_syms_after", F.lit(0)))
            .cast("int")
            .alias("n_merges_applied"),
            F.coalesce("encoded_fp", F.md5(F.lit(""))).alias("encoded_fp"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# EWMA: a recursive statistic as a deterministic in-engine fold
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.3

_EWMA_SQL = f"""
WITH RECURSIVE daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS x
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
seq AS (
    SELECT event_type, d, x,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS i
    FROM daily
),
ew(event_type, d, x, i, e) AS (
    SELECT event_type, d, x, i, x FROM seq WHERE i = 1
    UNION ALL
    SELECT s.event_type, s.d, s.x, s.i, {_EWMA_ALPHA} * s.x + {1 - _EWMA_ALPHA} * w.e
    FROM seq s JOIN ew w ON s.event_type = w.event_type AND s.i = w.i + 1
)
SELECT event_type, d, x AS daily_mean, ROUND(e, 9) AS ewma
FROM ew ORDER BY event_type, d
"""


@query("ewma_smoothing", _EWMA_SQL)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α={_EWMA_ALPHA}) over each event type's daily-mean series —
    a statistic that is RECURSIVE by definition (eₜ = α·xₜ + (1−α)·eₜ₋₁,
    e₁ = x₁), so no window function expresses it. It runs as a
    deterministic left fold (``F.aggregate``) over the date-sorted
    series; the oracle is a DuckDB recursive CTE walking the same
    recurrence — iterative-algorithm parity like bpe_merge_rules and
    dup_graph_pagerank, here for per-row stateful smoothing.

    Determinism: daily means use the exact-decimal-sum pattern (so the
    fold's INPUT doubles are engine-identical); each fold step is the
    same fixed-shape two-term expression evaluated in the same order;
    the smoothed output rounds at 9dp (belt — the folds are actually
    bit-identical).

    Scale shape: one shuffle to daily grain (map-side combinable), one
    groupBy(event_type) whose collected per-key series is bounded by
    the CALENDAR (30 days here; a few thousand for years), not event
    volume — the classic bounded-state per-key fold. Unbounded streams
    use the applyInPandasWithState sessionize pattern with the EWMA as
    the carried state; the recurrence is unchanged."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("x")
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("sx")
    )
    init = F.expr("CAST(array() AS array<struct<d:date,x:double,e:double>>)")
    folded = F.aggregate(
        F.col("sx"),
        init,
        lambda acc, el: F.concat(
            acc,
            F.array(
                F.struct(
                    el["d"].alias("d"),
                    el["x"].alias("x"),
                    F.when(F.size(acc) == 0, el["x"])
                    .otherwise(
                        F.lit(_EWMA_ALPHA) * el["x"]
                        + F.lit(1 - _EWMA_ALPHA) * F.element_at(acc, -1)["e"]
                    )
                    .alias("e"),
                )
            ),
        ),
    )
    return (
        series.select("event_type", F.explode(folded).alias("r"))
        .select(
            "event_type",
            F.col("r.d").alias("d"),
            F.col("r.x").alias("daily_mean"),
            F.round(F.col("r.e"), 9).alias("ewma"),
        )
        .orderBy("event_type", "d")
    )


# --------------------------------------------------------------------------
# MAD robust outliers: the heavy-tail-safe complement of the z-score
# --------------------------------------------------------------------------

_MAD_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
med AS (
    SELECT event_type, quantile_cont(total, 0.5) AS med
    FROM daily GROUP BY event_type
),
dev AS (
    SELECT d.event_type, d.d, d.total, m.med, abs(d.total - m.med) AS adev
    FROM daily d JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, quantile_cont(adev, 0.5) AS mad
    FROM dev GROUP BY event_type
)
SELECT v.event_type, v.d, v.total, v.med, a.mad,
       ROUND(CASE WHEN a.mad > 0 THEN v.adev / (1.4826 * a.mad)
                  ELSE 0.0 END, 9) AS robust_z,
       CASE WHEN a.mad > 0 THEN v.adev / (1.4826 * a.mad) > 3.5
            ELSE FALSE END AS is_outlier
FROM dev v JOIN mad a USING (event_type)
ORDER BY event_type, d
"""


@query("mad_outliers", _MAD_SQL)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection on daily totals via median absolute
    deviation: robust_z = |x − median| / (1.4826·MAD), flagged above
    3.5 — the heavy-tail-safe complement of ``value_outliers_zscore``
    (one extreme day inflates the standard deviation and hides its own
    anomaly; the median/MAD pair has breakdown point 0.5 and is immune
    to that masking).

    Determinism: daily totals are exact-decimal sums; the medians use
    Spark's exact ``percentile`` against DuckDB's ``quantile_cont``
    (identical linear-interpolation semantics — already proven bitwise
    by winsorized_stats/percentile_stats_by_lang); the one division is
    a fixed-shape double expression rounded 9dp, and the outlier flag
    derives from the identical unrounded doubles in both engines.

    Scale shape: fact → daily grain is one map-side-combinable
    shuffle; both medians aggregate the DAILY frame (calendar-bounded);
    the 5-row med/mad tables broadcast back. At 100 TB swap exact
    percentile for percentile_approx (t-digest — its error is measured
    by percentile_sketch_validation) and nothing else changes."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total")
    )
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(total, 0.5D)").alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("total") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    z = F.col("adev") / (F.lit(1.4826) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "d",
            "total",
            "med",
            "mad",
            F.round(F.when(F.col("mad") > 0, z).otherwise(F.lit(0.0)), 9).alias(
                "robust_z"
            ),
            F.when(F.col("mad") > 0, z > 3.5).otherwise(F.lit(False)).alias(
                "is_outlier"
            ),
        )
        .orderBy("event_type", "d")
    )


# --------------------------------------------------------------------------
# Benford first-digit audit: forensic screen for numeric feeds
# --------------------------------------------------------------------------

#: expected shares embedded as IDENTICAL double literals in both
#: engines (log10 evaluated once here, not per-engine)
_BENFORD = [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]

_BENFORD_SQL = f"""
WITH hist AS (
    SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                       1, 1) AS INT) AS digit,
           COUNT(*) AS n_obs
    FROM orders GROUP BY 1
),
expected(digit, expected_share) AS (
    -- e0 suffix forces DOUBLE literals (a bare decimal literal is
    -- DECIMAL-typed in DuckDB, which would drag the chi-squared math
    -- into fixed-point and overflow DECIMAL(38) on the squaring)
    VALUES {", ".join(f"({d}, {p!r}e0)" for d, p in _BENFORD)}
),
joined AS (
    SELECT e.digit, e.expected_share, COALESCE(h.n_obs, 0) AS n_obs
    FROM expected e LEFT JOIN hist h USING (digit)
),
tot AS (
    SELECT *, SUM(n_obs) OVER () AS n FROM joined
),
terms AS (
    SELECT *,
           CAST((n_obs - expected_share * n) * (n_obs - expected_share * n)
                / (expected_share * n) AS DECIMAL(38,18)) AS chi_term
    FROM tot
)
SELECT digit,
       CAST(n_obs AS BIGINT) AS n_obs,
       expected_share,
       ROUND(CAST(n_obs AS DOUBLE) / n, 9) AS obs_share,
       ROUND(CAST(SUM(chi_term) OVER () AS DOUBLE), 9) AS chi2_stat
FROM terms
ORDER BY digit
"""


@query("benford_digit_audit", _BENFORD_SQL)
def q_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic audit of order totals: the distribution
    of first significant digits vs log10(1+1/d), with the chi-squared
    statistic over all nine digits — the standard screen for
    fabricated, truncated, or unit-mangled numeric feeds before they
    poison downstream aggregates.

    Determinism: the first digit comes from an exact integer-string
    derivation (cents as BIGINT → first character), never from float
    formatting or log10-of-data (both engine-divergent); the expected
    shares are log10 literals computed ONCE in Python and embedded
    identically in both plans; chi² terms are per-digit fixed-shape
    double expressions cast to DECIMAL(38,18) and summed exactly
    (9-row window), rounded 9dp.

    Scale shape: one 9-group map-side-combinable count over the scan —
    the audit costs a scan regardless of table size; everything after
    runs on 9 rows."""
    orders = load_table(spark, "orders", sf_dir)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    hist = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    exp_df = spark.createDataFrame(
        _BENFORD, "digit int, expected_share double"
    )
    joined = exp_df.join(hist, "digit", "left").select(
        "digit", "expected_share", F.coalesce("n_obs", F.lit(0)).alias("n_obs")
    )
    wall = Window.partitionBy()
    tot = joined.withColumn("n", F.sum("n_obs").over(wall))
    diff = F.col("n_obs") - F.col("expected_share") * F.col("n")
    terms = tot.withColumn(
        "chi_term",
        (diff * diff / (F.col("expected_share") * F.col("n"))).cast(_DEC18),
    )
    return terms.select(
        "digit",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        "expected_share",
        F.round(F.col("n_obs").cast("double") / F.col("n"), 9).alias("obs_share"),
        F.round(F.sum("chi_term").over(wall).cast("double"), 9).alias("chi2_stat"),
    ).orderBy("digit")


# --------------------------------------------------------------------------
# Compaction planner: pack date partitions into target-size bins
# --------------------------------------------------------------------------

_COMPACT_BINS = 6

_COMPACT_SQL = f"""
WITH parts AS (
    SELECT CAST(o_orderdate AS DATE) AS pdate, COUNT(*) AS n_rows
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS n FROM parts),
seq AS (
    SELECT p.pdate, p.n_rows, (t.n + {_COMPACT_BINS - 1}) // {_COMPACT_BINS} AS target,
           COALESCE(SUM(p.n_rows) OVER (
               ORDER BY p.n_rows DESC, p.pdate
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM parts p CROSS JOIN tot t
)
SELECT CAST(cum_before // target AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_partitions,
       CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
       ROUND(CAST(SUM(n_rows) AS DOUBLE) / CAST(MAX(target) AS DOUBLE), 6)
           AS fill_ratio
FROM seq GROUP BY cum_before // target ORDER BY bin
"""


@query("compaction_bin_packing", _COMPACT_SQL)
def q_compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction PLANNER: pack per-date partitions into
    ~{_COMPACT_BINS} equal row-count bins (target = ⌈total/{_COMPACT_BINS}⌉)
    and audit each bin's partition count, row total, and fill ratio —
    the maintenance pass that turns a drip-fed date-partitioned table
    back into scan-efficient files. Assignment is sorted prefix-sum
    next-fit (order by size desc then date, bin = ⌊preceding-rows ÷
    target⌋): deterministic, one expression, and within one partition
    of first-fit-decreasing's fill for size ≪ target — which is
    exactly the small-files regime compaction targets.

    Determinism: pure integer arithmetic end to end (counts, integer
    division); the single double division (fill ratio) divides two
    exact integers.

    Scale shape: the fact collapses to a date histogram in one
    map-side-combinable count; the prefix-sum window runs over the
    HISTOGRAM (calendar-sized, thousands of rows for years), not the
    fact — this is the planner; the rewrite it prescribes is one
    repartitionByRange write per bin. For million-partition tables the
    same plan works off the metastore/manifest row counts without
    touching data at all."""
    orders = load_table(spark, "orders", sf_dir)
    parts = orders.groupBy(F.col("o_orderdate").cast("date").alias("pdate")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = parts.agg(F.sum("n_rows").alias("n"))
    w = Window.orderBy(F.col("n_rows").desc(), "pdate").rowsBetween(
        Window.unboundedPreceding, -1
    )
    seq = parts.crossJoin(F.broadcast(tot)).select(
        "pdate",
        "n_rows",
        F.expr(f"(n + {_COMPACT_BINS - 1}) div {_COMPACT_BINS}").alias("target"),
        F.coalesce(F.sum("n_rows").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        seq.groupBy(F.expr("cum_before div target").cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("n_rows").alias("bin_rows"),
            F.max("target").alias("target"),
        )
        .select(
            "bin",
            F.col("n_partitions").cast("bigint").alias("n_partitions"),
            F.col("bin_rows").cast("bigint").alias("bin_rows"),
            F.round(
                F.col("bin_rows").cast("double") / F.col("target").cast("double"), 6
            ).alias("fill_ratio"),
        )
        .orderBy("bin")
    )
