"""Round-4 wave 20: the distributed bootstrap — a confidence interval
for a 100 TB mean WITHOUT collecting anything, and without RNG state:
the Poisson bootstrap (each row joins resample b with weight ~
Poisson(1), the standard streaming/distributed approximation of
multinomial resampling — Chamandy et al., "Estimating uncertainty for
massive data streams", Google 2012; public method) with every draw
DERIVED from md5(row_key, b) — so both engines, any partitioning, any
retry produce the IDENTICAL resamples and the CI itself is
hash-checked against the oracle, the same estimate-beside-truth
discipline as kmv/HT/HLL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.queries.llm_pipeline import _hexparse_sql
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

_DEC = "decimal(18,6)"
_B = 50  # resamples
_CI_LO_IDX = 1   # floor(0.025 * (B-1)) for B=50
_CI_HI_IDX = 47  # floor(0.975 * (B-1)) for B=50

#: Poisson(1) inverse-CDF thresholds as FIXED double literals (shared
#: verbatim by both engines): P(X <= k) for k = 0..7; u beyond the last
#: threshold draws 8. u = first-8-hex(md5) / 2^32 — division by a power
#: of two is exact, so u is the same double everywhere.
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
    "0.9999909339719611",
)


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 8 END"


_U_SQL = (
    _hexparse_sql(
        "substr(md5(CAST(l_orderkey AS VARCHAR) || '-' "
        "|| CAST(l_linenumber AS VARCHAR) || '-' || CAST(b AS VARCHAR)), 1, 8)"
    )
    + " / 4294967296.0"
)

_BOOTSTRAP_SQL = f"""
WITH rows_x AS (
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS x
    FROM lineitem
),
drawn AS (
    SELECT b, {_pois_case_sql(f"({_U_SQL})")} AS w, x
    FROM rows_x, (SELECT unnest(range(1, {_B} + 1)) AS b)
),
means AS (
    SELECT b,
           CAST(SUM(CAST(w * x AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(SUM(w) AS DOUBLE) AS m
    FROM drawn GROUP BY b
),
ranked AS (
    SELECT m, ROW_NUMBER() OVER (ORDER BY m) - 1 AS i FROM means
),
exact AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_x
    FROM rows_x
)
SELECT e.n_rows,
       CAST({_B} AS INT) AS n_resamples,
       e.mean_x AS exact_mean,
       MAX(CASE WHEN r.i = {_CI_LO_IDX} THEN r.m END) AS ci_lo,
       MAX(CASE WHEN r.i = {_CI_HI_IDX} THEN r.m END) AS ci_hi
FROM ranked r CROSS JOIN exact e
GROUP BY e.n_rows, e.mean_x
"""


@query("bootstrap_mean_ci", _BOOTSTRAP_SQL)
def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean line revenue via the POISSON bootstrap
    ({B} resamples): row r's weight in resample b is the Poisson(1)
    draw selected by u = md5(key,b)/2³² through a fixed inverse-CDF
    ladder — no RNG, no seed plumbing, no collect; the draw is a pure
    function of (row key, b), so resamples are identical across
    engines, partitionings, and retries. The exact mean rides in the
    same row; CI endpoints are order statistics over the {B} resample
    means (the repo's floor(p·(B−1)) selection convention).

    Scale shape: ONE pass over the fact exploded ×{B} (b is a
    generated column, no shuffle to create it), reduced map-side to
    {B} (sum, count) cells — the whole bootstrap costs {B}× the scan's
    arithmetic but only {B} cells of shuffle; the order statistic runs
    on {B} rows. This is how uncertainty gets attached to 100 TB
    aggregates: never resample-and-materialize, always weight-and-
    reduce. Weighted sums quantize to decimals; u is exact (division
    by 2³²); the CDF thresholds are shared double literals."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("x"),
    )
    drawn = li.select(
        "x",
        "l_orderkey",
        "l_linenumber",
        F.explode(F.sequence(F.lit(1), F.lit(_B))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.lit(8)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < float(_POIS_CDF[k]), k).otherwise(w)
    means = (
        drawn.select("b", w.alias("w"), "x")
        .groupBy("b")
        .agg(
            (
                F.sum((F.col("w") * F.col("x")).cast(_DEC)).cast("double")
                / F.sum("w").cast("double")
            ).alias("m")
        )
    )
    from pyspark.sql import Window

    ranked = means.select(
        "m", (F.row_number().over(Window.orderBy("m")) - 1).alias("i")
    )
    exact = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(F.col("x").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
            "mean_x"
        ),
    )
    return (
        ranked.crossJoin(F.broadcast(exact))
        .groupBy("n_rows", "mean_x")
        .agg(
            F.max(F.when(F.col("i") == _CI_LO_IDX, F.col("m"))).alias("ci_lo"),
            F.max(F.when(F.col("i") == _CI_HI_IDX, F.col("m"))).alias("ci_hi"),
        )
        .select(
            "n_rows",
            F.lit(_B).cast("int").alias("n_resamples"),
            F.col("mean_x").alias("exact_mean"),
            "ci_lo",
            "ci_hi",
        )
    )
