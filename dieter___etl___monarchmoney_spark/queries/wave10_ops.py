"""Round-4 wave-10: the Spark 4 SQL-surface corners — VariantType
semi-structured analytics, recursive CTEs, and LATERAL joins — each
oracle-checked against the equivalent DuckDB construct.

Why these three: they are the surfaces a user coming OFF the reference
(which scalarizes every nested payload to a JSON string and walks
hierarchies client-side) gains by moving to a modern engine. Variant is
the 100 TB answer to JSON columns (binary-encoded, typed access without
a schema migration); recursive CTEs move hierarchy walks from client
loops into the engine; LATERAL expresses per-row correlated top-k
without a window over the whole fact.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table, sf_tag


def _tag(sf_dir: str) -> str:
    return sf_tag(sf_dir)  # shared helper: sources/parquet.py


# --------------------------------------------------------------------------
# Variant (semi-structured) analytics over events.props
# --------------------------------------------------------------------------

_VARIANT_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
           AS n_distinct_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS max_k
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 10
GROUP BY event_type
ORDER BY event_type
"""


@query("variant_props_rollup", _VARIANT_SQL)
def q_variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured rollup through Spark 4's VARIANT type: the
    events.props JSON string parses ONCE into a binary variant
    (parse_json), fields come out typed via variant_get with a JSON
    path, and the filter/aggregate run on the extracted integers. The
    reference stores nested payloads as JSON strings and re-parses
    per access (F12 scalarize-to-JSON); Variant is the engine-native
    upgrade — parse once, access O(field), no schema migration when
    payloads evolve.

    Scale shape: parse_json + variant_get are per-row expressions
    inside the scan's project (no UDF, no shuffle); the rollup is one
    map-side-combinable aggregate over #event_types groups. At 100 TB
    the win over string JSON is the binary encoding: the parse cost is
    paid once per row, not once per field access, and shredded storage
    (Parquet variant shredding) pushes field pruning into the scan.
    Integer sums keep the oracle exact (no float JSON semantics)."""
    ev = load_table(spark, "events", sf_dir)
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Recursive CTE: ancestry walk over a deterministic referral tree
# --------------------------------------------------------------------------

#: Both engines run the SAME recursive SQL text (dialect-identical):
#: the referral tree is the deterministic halving chain parent(u) = u/2
#: (integer division), giving every user a path to root 1 — a synthetic
#: but honest hierarchy (the star has no parent-keyed entity), and the
#: recursion itself is the thing under test: the ancestor count and the
#: depth must agree between Spark's recursive-CTE execution (iterative
#: union in the engine) and DuckDB's.
_RECURSIVE_SQL_BODY = """
WITH RECURSIVE walk (user_id, anc, depth) AS (
    SELECT user_id, user_id AS anc, 0 AS depth FROM users
    UNION ALL
    SELECT user_id, CAST(FLOOR(anc / 2) AS BIGINT) AS anc, depth + 1 AS depth
    FROM walk WHERE anc > 1
)
SELECT user_id,
       CAST(MAX(depth) AS BIGINT) AS depth_to_root,
       CAST(COUNT(*) AS BIGINT) AS n_ancestors,
       CAST(SUM(anc) AS BIGINT) AS anc_checksum
FROM walk
GROUP BY user_id
ORDER BY user_id
"""

#: DuckDB wants RECURSIVE right after WITH for the whole CTE list, so
#: the oracle prepends the users CTE inside the same WITH RECURSIVE.
_RECURSIVE_ORACLE = (
    "WITH RECURSIVE users AS (SELECT DISTINCT user_id FROM events),\n"
    + _RECURSIVE_SQL_BODY.replace("WITH RECURSIVE ", "", 1)
)


@query("recursive_referral_depth", _RECURSIVE_ORACLE)
def q_recursive_referral_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.1 WITH RECURSIVE): walk each user's
    referral ancestry — parent(u) = u ÷ 2, the deterministic halving
    tree — to the root, reporting depth, ancestor count, and a path
    checksum. The reference walks hierarchies client-side (category →
    group chains resolved per row in Python); a recursive CTE keeps
    the iteration IN the engine, where each step is a distributed
    self-union instead of a driver loop.

    Both engines execute the same recursive SQL text (DuckDB spells it
    `WITH RECURSIVE` inside the view chain), so the parity row checks
    Spark's iterative-union execution against an independent recursive
    executor — semantics, not just syntax.

    Scale shape: recursion depth is log2(max user_id) ≈ 17 at 10⁵
    users; each step is one narrow union-increment over the frontier
    (rows with anc > 1), so total work is O(users · depth) with no
    shuffle until the final per-user aggregate. The frontier never
    explodes: the halving tree has out-degree 1 upward."""
    users = (
        load_table(spark, "events", sf_dir).select("user_id").distinct()
    )
    view = f"users_{_tag(sf_dir)}"
    users.createOrReplaceTempView(view)
    return spark.sql(_RECURSIVE_SQL_BODY.replace("FROM users", f"FROM {view}", 1))


# --------------------------------------------------------------------------
# LATERAL join: each order's best line via a correlated subquery
# --------------------------------------------------------------------------

_LATERAL_BODY = """
SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_quantity
FROM orders o,
LATERAL (
    SELECT l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey = o.o_orderkey
    ORDER BY l_quantity DESC, l_linenumber
    LIMIT 1
) l
WHERE o.o_orderstatus = 'F'
ORDER BY o.o_orderkey
LIMIT 500
"""


@query("lateral_best_line_per_order", _LATERAL_BODY)
def q_lateral_best_line_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: for each finished order, its
    single largest-quantity line (deterministic tie-break on line
    number) — the per-row top-k join form SQL engines express as
    LATERAL and the reference expresses as a client-side loop over
    order ids (one GraphQL call per order, MonarchMoneyMain-v3 detail
    fetches). Identical SQL text runs on both engines.

    Scale shape: Catalyst decorrelates the LATERAL into a
    window/aggregate over the lineitem side keyed on l_orderkey joined
    back to orders — one orderkey shuffle, never a per-row subquery
    execution (the plan-hygiene sweep pins no CartesianProduct
    registry-wide). The same query via the DataFrame API is the
    max(struct) pattern (cdc_latest_state); LATERAL earns its place as
    the SQL-surface twin users migrate with."""
    tag = _tag(sf_dir)
    load_table(spark, "orders", sf_dir).createOrReplaceTempView(f"orders_{tag}")
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView(
        f"lineitem_{tag}"
    )
    sql = _LATERAL_BODY.replace("FROM orders o", f"FROM orders_{tag} o").replace(
        "FROM lineitem", f"FROM lineitem_{tag}"
    )
    return spark.sql(sql)


# --------------------------------------------------------------------------
# Observation: in-flight data-quality metrics on the scan you already run
# --------------------------------------------------------------------------

_OBSERVE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       CAST(COUNT(CASE WHEN value < 0 THEN 1 END) AS BIGINT) AS n_negative,
       CAST(COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT)
           AS n_null_user,
       CAST(MIN(value) AS DOUBLE) AS min_value,
       CAST(MAX(value) AS DOUBLE) AS max_value
FROM events
"""


@query("observed_scan_metrics", _OBSERVE_SQL)
def q_observed_scan_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality metrics via ``DataFrame.observe`` — Spark's
    in-flight observation channel: the counters ride the SAME job that
    scans the data (accumulator-backed, zero extra passes in a real
    pipeline), instead of the reference's separate validation queries
    (reconciliation_audit's protocol run as a second scan). Here the
    observed frame is driven by a count() and the collected metrics
    come back as a 1-row frame so the oracle can check the VALUES the
    channel reports — observation is only worth having if its numbers
    equal the ground-truth aggregate.

    Scale shape: observe() adds per-partition accumulator updates to
    an existing action — O(1) extra state per task, no shuffle, no
    second scan in production (the demo's count() stands in for the
    pipeline's real action). The sum uses the exact-decimal pattern so
    the observed total is order-independent like every other money
    aggregate in the repo."""
    from pyspark.sql import Observation

    ev = load_table(spark, "events", sf_dir)
    obs = Observation(f"scan_audit_{_tag(sf_dir)}")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
            "total_value"
        ),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("n_null_user"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    observed.count()  # the action the metrics ride on
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                float(m["total_value"]),
                m["n_negative"],
                m["n_null_user"],
                float(m["min_value"]),
                float(m["max_value"]),
            )
        ],
        "n_rows long, total_value double, n_negative long, n_null_user long, "
        "min_value double, max_value double",
    )
