"""Round-4 wave 14: two physical-execution showcases —

- dynamic partition pruning (DPP): a date-partitioned fact joined to a
  RUNTIME-derived dimension must scan only the surviving partitions
  (the mechanism behind "the dim filter prunes the fact scan" at
  warehouse scale, and a pillar of the 100 TB story: partition layout
  is only worth anything if joins actually prune by it);
- approximate query processing: a DETERMINISTIC md5-bucket sample with
  a Horvitz-Thompson scale-up, reported NEXT TO the exact answer so
  the estimate's error is itself part of the parity-checked contract
  (the same estimate-beside-truth discipline as kmv_set_similarity
  and approx_distinct_validation).

Reference framing: the reference engine (monarchmoney.py GraphQL
client) has neither partitioned storage nor sampling; these anchor the
Spark-native physical-layout story documented in SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.queries.llm_pipeline import _hexparse_sql
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table, sf_tag

_DEC = "decimal(18,6)"


def _digest(sf_dir: str) -> str:
    return sf_tag(sf_dir, 10)  # shared helper: sources/parquet.py


# --------------------------------------------------------------------------
# Dynamic partition pruning over a date-partitioned events copy
# --------------------------------------------------------------------------

_DPP_TOP_DAYS = 3

#: "busy days" = days whose event count reaches the 3rd-highest count —
#: a threshold FILTER (not a LIMIT) because Spark's DPP insertion
#: requires a selective predicate on the dimension side; ties beyond
#: three days are included identically by both engines.
_DPP_SQL = f"""
WITH counts AS (
    SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n
    FROM events GROUP BY 1
),
th AS (
    SELECT n AS threshold FROM counts
    ORDER BY n DESC LIMIT 1 OFFSET {_DPP_TOP_DAYS - 1}
),
busy AS (
    SELECT event_date FROM counts, th WHERE n >= threshold
)
SELECT e.event_date,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM (SELECT CAST(ts AS DATE) AS event_date, value FROM events) e
JOIN busy t ON t.event_date = e.event_date
GROUP BY e.event_date
ORDER BY e.event_date
"""


def _partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per sf_dir) a copy of events partitioned by
    event_date — the layout a warehouse would maintain; cached across
    invocations because the partitioned copy IS the fixture, not the
    operator under test."""
    out = os.path.join(tempfile.gettempdir(), f"events_bydate_{_digest(sf_dir)}")
    marker = os.path.join(out, "_SUCCESS_LAYOUT")
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        (
            load_table(spark, "events", sf_dir)
            .withColumn("event_date", F.col("ts").cast("date"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(out)
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    return out


@query("dpp_top_days_rollup", _DPP_SQL)
def q_dpp_top_days_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact is a DATE-PARTITIONED copy
    of events; the dimension — the busiest days — exists only at
    RUNTIME (it is itself an aggregate of the fact), so no static
    rewrite can prune the scan. With DPP the broadcast of the dim
    seeds a subquery filter on the fact's partition column and the
    scan reads the surviving directories instead of all of them; the
    plan test pins the ``dynamicpruning`` expression.

    Two DPP-triggering details, both learned from the plan: (a) the
    dim needs a selective FILTER predicate — a LIMIT-top-k dim does
    not qualify for Spark's insertion heuristic, so "top 3" becomes
    "count >= 3rd-highest count" with the threshold collected as an
    O(1) driver scalar; (b) the filter column (n) must differ from
    the join column (event_date), otherwise constraint propagation
    turns the pruning static.

    Scale shape: THE mechanism that makes date-partitioned 100 TB
    facts queryable — join-driven partition elimination. The dim is a
    date-cardinality aggregate (broadcast); the pruned scan reads
    |busy days| partitions; the final rollup is map-side-combinable
    with exact-decimal sums. The partitioned copy is a per-sf cached
    fixture (layout, not computation)."""
    part_dir = _partitioned_events(spark, sf_dir)
    fact = spark.read.parquet(part_dir)
    counts = fact.groupBy("event_date").agg(F.count(F.lit(1)).alias("n"))
    # 3rd-highest daily count: bounded driver read (one scalar from a
    # date-cardinality aggregate), baked in as a literal so the dim
    # subtree is Aggregate+Filter — the shape DPP's heuristic accepts.
    # Mirror the oracle's OFFSET semantics exactly: fewer than
    # _DPP_TOP_DAYS distinct days means the threshold row does not
    # exist and the busy set is EMPTY (not "all days").
    tops = [r.n for r in counts.orderBy(F.col("n").desc()).limit(_DPP_TOP_DAYS).collect()]
    if len(tops) < _DPP_TOP_DAYS:
        busy = counts.filter(F.lit(False)).select(F.col("event_date").alias("d"))
    else:
        busy = counts.filter(F.col("n") >= F.lit(tops[-1])).select(
            F.col("event_date").alias("d")
        )
    return (
        fact.join(F.broadcast(busy), F.col("d") == F.col("event_date"))
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .orderBy("event_date")
    )


# --------------------------------------------------------------------------
# Deterministic-sample Horvitz-Thompson estimate beside the exact answer
# --------------------------------------------------------------------------

_SAMPLE_MOD = 10  # keep 1-in-10 lines

_HT_BUCKET = "md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))"

_HT_SQL = f"""
WITH tagged AS (
    SELECT l_extendedprice * (1 - l_discount) AS rev,
           {_hexparse_sql(f"substr({_HT_BUCKET}, 1, 8)")} % {_SAMPLE_MOD} = 0
               AS in_sample
    FROM lineitem
),
sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS exact_revenue,
           CAST({_SAMPLE_MOD} * SUM(CASE WHEN in_sample
                     THEN CAST(rev AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               AS est_revenue
    FROM tagged
)
SELECT n_total, n_sampled, exact_revenue, est_revenue,
       ABS(est_revenue - exact_revenue) / exact_revenue AS rel_err
FROM sums
"""


@query("sampled_revenue_estimate", _HT_SQL)
def q_sampled_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing with a verifiable contract: a
    1-in-{M} DETERMINISTIC sample (md5 of the line's primary key — the
    same engine-portable bucketing as train_val_test_split, so both
    engines select the IDENTICAL sample) scaled up Horvitz-Thompson
    style, with the exact total and the realized relative error in
    the same row. The estimate is reproducible run-to-run and
    engine-to-engine — no RNG, no seed plumbing.

    Scale shape: one map-side-combinable pass computing both the
    sampled and exact sums (at 100 TB the exact column is dropped and
    the scan reads 100% but aggregates only the 10% — or, with the
    sample materialized as a bucketed table, reads 10%); the md5
    bucket is the scan-level predicate that makes sampled tables
    co-partitionable with their parents. Both sums quantize to
    DECIMAL(18,6); the HT scale-up multiplies an exact decimal by an
    integer before the double finish."""
    li = load_table(spark, "lineitem", sf_dir)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") % _SAMPLE_MOD == 0
    agg = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(bucket, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
        F.sum(rev).cast("double").alias("exact_revenue"),
        (F.lit(_SAMPLE_MOD) * F.sum(F.when(bucket, rev).otherwise(zero)))
        .cast("double")
        .alias("est_revenue"),
    )
    return agg.select(
        "n_total",
        "n_sampled",
        "exact_revenue",
        "est_revenue",
        (
            F.abs(F.col("est_revenue") - F.col("exact_revenue"))
            / F.col("exact_revenue")
        ).alias("rel_err"),
    )
