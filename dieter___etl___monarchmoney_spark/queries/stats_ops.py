"""Distribution-shift audits: the two classical nonparametric
two-sample tests, computed in-engine with exact arithmetic.

- ``ks_two_sample``: Kolmogorov–Smirnov D between the `value`
  distributions of two event types — detects ANY distributional
  difference (location, scale, shape) between a reference cohort and a
  candidate one. The canonical drift monitor for ML feature pipelines.
- ``mann_whitney_u``: the rank-sum test (with tie-corrected normal
  approximation) — the robust location-shift test that doesn't assume
  normality, complementing the parametric z/chi² family
  (value_outliers_zscore, weekday_type_chi2).

Reference framing: SURVEY.md §6 pipeline-extension family (data-drift
monitoring between ingest batches); no counterpart in the reference.

Determinism: both tests reduce the facts to a distinct-VALUE histogram
with per-side counts; every statistic is then exact-integer window
arithmetic plus a fixed-shape final expression (divisions, one IEEE
sqrt — an exactly-rounded operation in both engines), rounded 9dp at
the edge. No transcendental sums, no float accumulation.

Scale shape: one combinable count shuffle to the value histogram; the
ordered window runs over the HISTOGRAM (support-sized, not
fact-sized). For continuous supports at 100 TB, pre-bucket values to
fixed-width bins (KS on binned data bounds D within one bin mass) or
feed the t-digest quantiles — the window algebra is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

_SIDE_A = "click"
_SIDE_B = "purchase"

#: two-sided 5% critical coefficient for the large-sample KS bound
_KS_COEFF = 1.358

_KS_SQL = f"""
WITH hist AS (
    SELECT value,
           SUM(CASE WHEN event_type = '{_SIDE_A}' THEN 1 ELSE 0 END) AS c1,
           SUM(CASE WHEN event_type = '{_SIDE_B}' THEN 1 ELSE 0 END) AS c2
    FROM events
    WHERE event_type IN ('{_SIDE_A}', '{_SIDE_B}')
    GROUP BY value
),
cum AS (
    -- totals as whole-frame window sums over the SAME histogram pass:
    -- a scalar-subquery/cross-join total would recompute the histogram
    -- lineage and scan the fact twice
    SELECT value,
           SUM(c1) OVER (ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum1,
           SUM(c2) OVER (ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum2,
           CAST(SUM(c1) OVER () AS BIGINT) AS n1,
           CAST(SUM(c2) OVER () AS BIGINT) AS n2
    FROM hist
),
dists AS (
    SELECT value, n1, n2,
           abs(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2) AS d,
           MAX(abs(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2))
               OVER () AS dmax
    FROM cum
)
SELECT d.n1, d.n2,
       ROUND(d.dmax, 9) AS ks_d,
       MIN(d.value) AS at_value,
       ROUND({_KS_COEFF} * sqrt(CAST(d.n1 + d.n2 AS DOUBLE)
                                / (CAST(d.n1 AS DOUBLE) * d.n2)), 9) AS d_crit_05,
       d.dmax > {_KS_COEFF} * sqrt(CAST(d.n1 + d.n2 AS DOUBLE)
                                   / (CAST(d.n1 AS DOUBLE) * d.n2)) AS significant
FROM dists d
WHERE d.d = d.dmax
GROUP BY d.n1, d.n2, d.dmax
"""


@query("ks_two_sample", _KS_SQL)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov two-sample test between the '{_SIDE_A}' and
    '{_SIDE_B}' value distributions: D = max |F̂₁(v) − F̂₂(v)| over the
    combined support, with its location and the 5% large-sample
    critical bound. One output row: the drift verdict a feature
    pipeline gates on between ingest batches.

    The empirical CDFs come from exact-integer running counts over the
    distinct-value histogram; D's argmax row is selected by exact
    double equality (identical doubles both engines), ties broken by
    MIN(value)."""
    events = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin(_SIDE_A, _SIDE_B)
    )
    hist = events.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == _SIDE_A, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == _SIDE_B, 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    # totals as whole-frame window sums over the SAME histogram pass: a
    # broadcast-total crossJoin would recompute the histogram lineage
    # and scan the fact twice
    cum = hist.select(
        "value",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
        F.sum("c1").over(wall).cast("bigint").alias("n1"),
        F.sum("c2").over(wall).cast("bigint").alias("n2"),
    )
    d_expr = F.abs(
        F.col("cum1").cast("double") / F.col("n1")
        - F.col("cum2").cast("double") / F.col("n2")
    )
    dists = cum.select(
        "value",
        "n1",
        "n2",
        d_expr.alias("d"),
        F.max(d_expr).over(wall).alias("dmax"),
    )
    crit = F.lit(_KS_COEFF) * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double")
        / (F.col("n1").cast("double") * F.col("n2"))
    )
    return (
        dists.filter(F.col("d") == F.col("dmax"))
        .groupBy("n1", "n2", "dmax")
        .agg(F.min("value").alias("at_value"))
        .select(
            "n1",
            "n2",
            F.round(F.col("dmax"), 9).alias("ks_d"),
            "at_value",
            F.round(crit, 9).alias("d_crit_05"),
            (F.col("dmax") > crit).alias("significant"),
        )
    )


_MW_SQL = f"""
WITH hist AS (
    SELECT value,
           SUM(CASE WHEN event_type = '{_SIDE_A}' THEN 1 ELSE 0 END) AS c1,
           SUM(CASE WHEN event_type = '{_SIDE_B}' THEN 1 ELSE 0 END) AS c2
    FROM events
    WHERE event_type IN ('{_SIDE_A}', '{_SIDE_B}')
    GROUP BY value
),
ranked AS (
    SELECT c1, c2, c1 + c2 AS ct,
           COALESCE(SUM(c1 + c2) OVER (ORDER BY value
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM hist
),
agg AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1,
           CAST(SUM(c2) AS BIGINT) AS n2,
           -- 2×R1 stays integer under average ranks: avg_rank2 = 2·cum_before + ct + 1
           CAST(SUM(c1 * (2 * cum_before + ct + 1)) AS BIGINT) AS r1_2,
           CAST(SUM(CASE WHEN ct > 1
                         THEN ct * ct * ct - ct ELSE 0 END) AS BIGINT) AS tie_t3
    FROM ranked
),
stats AS (
    SELECT n1, n2, r1_2, tie_t3,
           n1 + n2 AS n,
           (CAST(r1_2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2.0 AS u1
    FROM agg
)
SELECT n1, n2, u1,
       CAST(n1 AS DOUBLE) * n2 - u1 AS u2,
       ROUND((u1 - CAST(n1 AS DOUBLE) * n2 / 2.0)
             / sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
                    * ((n + 1) - CAST(tie_t3 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))),
             9) AS z_stat,
       abs((u1 - CAST(n1 AS DOUBLE) * n2 / 2.0)
           / sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
                  * ((n + 1) - CAST(tie_t3 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))))
           > 1.96 AS significant
FROM stats
"""


@query("mann_whitney_u", _MW_SQL)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test between the same two cohorts:
    average ranks over the distinct-value histogram (kept exact by
    carrying 2×rank as an integer), U from the rank sum, and the
    tie-corrected normal approximation z — the robust location-shift
    complement to KS's any-difference detector.

    Every sum is exact-integer; u1/u2 are exact dyadic halves; z is one
    fixed-shape double expression (the sqrt is IEEE-exact) rounded 9dp,
    with the significance flag derived from the identical unrounded
    double in both engines."""
    events = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin(_SIDE_A, _SIDE_B)
    )
    hist = events.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == _SIDE_A, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == _SIDE_B, 1).otherwise(0)).alias("c2"),
    )
    wb = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.select(
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("ct"),
        F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(wb), F.lit(0)).alias(
            "cum_before"
        ),
    )
    agg = ranked.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cum_before") + F.col("ct") + 1))
        .cast("bigint")
        .alias("r1_2"),
        F.sum(
            F.when(
                F.col("ct") > 1,
                F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tie_t3"),
    )
    n = F.col("n1") + F.col("n2")
    u1 = (F.col("r1_2").cast("double") - F.col("n1").cast("double") * (F.col("n1") + 1)) / F.lit(2.0)
    z = (u1 - F.col("n1").cast("double") * F.col("n2") / F.lit(2.0)) / F.sqrt(
        (F.col("n1").cast("double") * F.col("n2") / F.lit(12.0))
        * (
            (n + 1)
            - F.col("tie_t3").cast("double") / (n.cast("double") * (n - 1))
        )
    )
    return agg.select(
        "n1",
        "n2",
        u1.alias("u1"),
        (F.col("n1").cast("double") * F.col("n2") - u1).alias("u2"),
        F.round(z, 9).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant"),
    )
