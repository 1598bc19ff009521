"""Round-4 wave-8: physical-layout operators — the bucketed
(pre-shuffled) join and its audit.

Bucketing is THE 100 TB lever this repo's SCALE.md keeps promising
("at scale both sides bucket by the key and the shuffle vanishes");
this module makes the claim executable and testable instead of prose:
it writes both join sides as bucketed+sorted tables and runs the join
that Spark then plans WITHOUT a shuffle on either side
(tests/test_plans.py pins the Exchange count).

Reference framing: the reference engine has no physical-layout surface
at all (a GraphQL API owns storage); this is the Spark-native answer to
the layout problem its sheet sink sidesteps — and the piece a 100 TB
deployment cannot skip.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table, sf_tag

_N_BUCKETS = 8

_BUCKETED_SQL = """
WITH li_agg AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderpriority,
       CAST(SUM(CAST(revenue AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
       CAST(SUM(n_lines) AS BIGINT) AS total_lines,
       COUNT(*) AS n_orders
FROM li_agg JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize the per-order revenue aggregate and the orders
    projection as BUCKETED, SORTED tables on the shared join key —
    the write-once layout that amortizes the orderkey shuffle across
    every downstream join. Returns the (lineitem_agg, orders) table
    names (md5-suffixed per sf_dir so scale factors never collide).

    Layout contract: same bucket count and same single bucket column on
    both sides, sortBy the key inside each bucket — exactly what Spark
    requires to plan SortMergeJoin with NO Exchange and NO per-task
    Sort on either side."""
    tag = sf_tag(sf_dir)
    li_tbl, ord_tbl = f"li_by_order_{tag}", f"orders_by_order_{tag}"
    # The warehouse DIRECTORY outlives the in-memory catalog (a fresh
    # session forgets the table but the files remain), and saveAsTable
    # refuses to claim a location it didn't register — so drop both the
    # catalog entry AND any orphaned location before writing.
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    for tbl in (li_tbl, ord_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{wh}/{tbl}", ignore_errors=True)
    li_agg = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    # ONE file per bucket: Spark only trusts (and reuses) the bucket's
    # sortBy order when a bucket is a single file, and a spray of
    # per-task files per bucket is the small-files antipattern at scale
    # anyway. repartition on the bucket column with numPartitions ==
    # numBuckets uses the same murmur3 hash as the bucket assignment,
    # so each write task holds exactly one whole bucket.
    (
        li_agg.repartition(_N_BUCKETS, F.col("l_orderkey"))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(_N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(li_tbl)
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority"
    )
    (
        orders.repartition(_N_BUCKETS, F.col("o_orderkey"))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(_N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(ord_tbl)
    )
    return li_tbl, ord_tbl


def bucketed_join(spark: SparkSession, li_tbl: str, ord_tbl: str) -> DataFrame:
    """The shuffle-free fact join over the bucketed layout (exposed
    separately from the aggregate so the plan test can pin ZERO
    Exchange operators on the join itself)."""
    return spark.table(li_tbl).join(
        spark.table(ord_tbl),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )


@query("bucketed_join_audit", _BUCKETED_SQL)
def q_bucketed_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end bucketing audit: write both join sides bucketed+sorted
    on the order key, join them, and roll revenue up to order priority.

    Scale shape — the point of the query: the join plans with NO
    Exchange and NO Sort on either side (bucket-pruned SortMergeJoin
    over co-located buckets; pinned by tests/test_plans.py); the only
    shuffle in the whole plan is the final 5-group rollup. At 100 TB
    this is the difference between re-shuffling the fact for every
    join and paying the shuffle ONCE at layout time — the same trade
    the repo's incremental windows make for writes. Bucket count is 8
    at demo scale; production sizes buckets to ~executor-memory-sized
    splits of the fact (and bucket counts must match across tables,
    so it is a LAYOUT-TIME contract, not a per-query knob)."""
    li_tbl, ord_tbl = bucketed_tables(spark, sf_dir)
    return (
        bucketed_join(spark, li_tbl, ord_tbl)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("revenue").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_revenue"),
            F.sum("n_lines").alias("total_lines"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )
