"""Round-4 OLAP anchors: the TPC-H correlated-subquery / decorrelation
family (Q4, Q8, Q14, Q15, Q16, Q17, Q21, Q22 shapes), adapted to the
driver star's columns (no commitdate/receiptdate/partsupp/phone — each
docstring states the substitution).

Why these eight matter beyond breadth: every one is a shape the classic
warehouse engines special-case in the OPTIMIZER — EXISTS/NOT EXISTS
(semi/anti join), correlated scalar aggregates (decorrelate to a
grouped join), scalar subqueries against the whole table (broadcast a
1-row frame), and aggregate-of-aggregate ("max over a grouped view").
The Spark forms below express each decorrelation EXPLICITLY as
DataFrame algebra (left_semi / left_anti / groupBy-then-join /
broadcast 1-row), i.e. the plan Catalyst's own subquery decorrelation
would produce — so the physical plan is deterministic and auditable
rather than dependent on rewrite heuristics.

Determinism discipline (same as queries/olap.py): per-row money
products are fixed-shape double arithmetic, every SUM quantizes to
DECIMAL(18,6) first, every AVG is exact-decimal-sum / count, every
ORDER BY ends in a unique tie-break column, and comparisons against a
derived average always compare against the SAME deterministic double
on both engines.

Reference framing: the reference engine (monarchmoney.py GraphQL
client) has no analytic SQL surface; these anchor the repo's claim of
being a general analytics engine over the same star the rest of the
repo maps the reference's entities onto (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

_DEC = "decimal(18,6)"


def _dsum(col) -> F.Column:  # exact-decimal order-independent SUM -> DOUBLE
    return F.sum(col.cast(_DEC)).cast("double")


# --------------------------------------------------------------------------
# Q4 shape — order priority check (EXISTS -> left_semi)
# --------------------------------------------------------------------------

_Q4_START, _Q4_END = "1997-01-01", "1997-07-01"

_Q4_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '{_Q4_START}'
  AND CAST(o_orderdate AS DATE) <  DATE '{_Q4_END}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("order_priority_check", _Q4_SQL)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a half-year window counted per
    priority when at least one of their lines signals a problem. The
    driver star has no l_commitdate/l_receiptdate, so "late line"
    becomes "returned line" (l_returnflag = 'R') — the EXISTS shape is
    identical.

    Scale shape: the EXISTS is a LEFT SEMI join — Spark never
    materializes the match multiplicity, and the lineitem side is
    pre-filtered to returned lines and pruned to the join key only
    (ReadSchema: 2 columns). The date filter pushes into the orders
    scan; the semi join shuffles on orderkey; the final aggregate moves
    5 groups. No subquery machinery survives into the physical plan."""
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(
            (F.col("o_orderdate").cast("date") >= F.lit(_Q4_START).cast("date"))
            & (F.col("o_orderdate").cast("date") < F.lit(_Q4_END).cast("date"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    returned = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q14 shape — promotion revenue share (conditional agg over a dim join)
# --------------------------------------------------------------------------

_Q14_START, _Q14_END = "1997-03-01", "1997-04-01"

_Q14_SQL = f"""
SELECT CAST(100.0 * (
         CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,6))
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE)
       ) AS DOUBLE) AS promo_revenue_pct,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '{_Q14_START}'
  AND CAST(l_shipdate AS DATE) <  DATE '{_Q14_END}'
"""


@query("promo_revenue_share", _Q14_SQL)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the share of one month's revenue earned by
    promotional parts (p_type = 'PROMO'; the driver star's p_type is a
    single word, so equality replaces TPC-H's LIKE 'PROMO%%').

    Scale shape: part is a broadcast dim (key + 1 flag column), the
    month predicate pushes into the lineitem scan, and the whole query
    is one map-side-combinable aggregate producing 1 row. Both sums
    quantize to DECIMAL(18,6) and the ratio divides the two exact
    doubles in the same order on both engines — a ratio of two
    order-independent sums is itself order-independent."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate").cast("date") >= F.lit(_Q14_START).cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit(_Q14_END).cast("date"))
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                F.lit(100.0)
                * (F.sum(promo).cast("double") / F.sum(rev).cast("double"))
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# Q15 shape — top supplier (aggregate-of-aggregate via broadcast max)
# --------------------------------------------------------------------------

_Q15_START, _Q15_END = "1997-01-01", "1997-04-01"

_Q15_SQL = f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '{_Q15_START}'
      AND CAST(l_shipdate AS DATE) <  DATE '{_Q15_END}'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("top_supplier_revenue", _Q15_SQL)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the maximum over the per-supplier revenue view — the canonical
    aggregate-of-aggregate (TPC-H phrases it as a view + scalar
    subquery).

    Scale shape: the revenue view is one grouped aggregate over the
    pruned, date-filtered scan (supplier-cardinality output); the
    scalar MAX over it is a 1-row frame broadcast back — NOT a global
    window sort. Equality on total_revenue is equality of two
    identically-derived doubles (exact decimal sums), so the filter
    cannot flake. Supplier is broadcast for the name join."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate").cast("date") >= F.lit(_Q15_START).cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit(_Q15_END).cast("date"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 shape — part/supplier variety (NOT IN -> left_anti + COUNT DISTINCT)
# --------------------------------------------------------------------------

_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#4'
  AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 50
"""


@query("part_supplier_variety", _Q16_SQL)
def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    (brand, type, size) bucket, excluding filtered brands/types and a
    NOT-IN supplier blocklist. The driver star has no partsupp, so
    lineitem supplies the part↔supplier pairs, and the "complaints"
    blocklist becomes suppliers with negative account balance.

    Scale shape: NOT IN over a provably non-null key is a LEFT ANTI
    join against a broadcast blocklist (supplier-sized). Part is a
    broadcast dim with the brand/type filters applied BEFORE the
    broadcast. COUNT(DISTINCT supplier) runs as Spark's two-phase
    distinct-aggregate — partial distinct per partition on the
    (group, suppkey) expand, then the final count — never a collect.
    Top-50 with a full column tie-break is TakeOrderedAndProject."""
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    part = (
        load_table(spark, "part", sf_dir)
        .filter((F.col("p_brand") != "Brand#4") & (F.col("p_type") != "PROMO"))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    blocked = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(blocked, li.l_suppkey == blocked.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(50)
    )


# --------------------------------------------------------------------------
# Q17 shape — small-quantity revenue (correlated AVG -> grouped join)
# --------------------------------------------------------------------------

_Q17_SQL = """
WITH part_avg AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
           AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN part_avg USING (l_partkey)
WHERE p_brand = 'Brand#4' AND l_quantity < 0.5 * avg_qty
"""


@query("small_quantity_revenue", _Q17_SQL)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue that would be lost by refusing
    small-quantity orders — each line compares against HALF THE AVERAGE
    QUANTITY OF ITS OWN PART, TPC-H's canonical correlated scalar
    aggregate. Decorrelated explicitly: the per-part average is a
    grouped aggregate joined back on partkey (exactly what Catalyst's
    RewriteCorrelatedScalarSubquery produces).

    Determinism: the averages the filter compares against are
    exact-decimal sums over counts — bit-identical doubles in both
    engines, so the `< 0.5*avg` boundary can never flip a row. The SQL
    oracle intentionally writes the SAME decorrelated form (DuckDB
    would decorrelate the TPC-H original to it anyway).

    Scale shape: per-part averages are fact-cardinality-reduced to part
    cardinality before the join; the brand filter prunes via the
    broadcast part dim; final output is 1 row. The avg join shuffles
    on partkey — co-partitioned with the fact's natural access path
    (at 100 TB both sides bucket by partkey and the shuffle vanishes)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    brand = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q21 shape — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# --------------------------------------------------------------------------

_Q21_SQL = """
WITH li2 AS (
    SELECT l_orderkey, l_suppkey,
           (CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
            + INTERVAL 60 DAY) AS late
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
),
per_order AS (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
           MAX(CASE WHEN late THEN l_suppkey END) AS sole_late_supp
    FROM li2 GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM per_order JOIN supplier ON s_suppkey = sole_late_supp
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""


@query("waiting_orders_suppliers", _Q21_SQL)
def q_waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order. TPC-H writes it as EXISTS (another
    supplier on the order) AND NOT EXISTS (another LATE supplier);
    with no receipt/commit dates, "late" is shipped > 60 days after
    the order date.

    Decorrelation: both correlated quantifiers collapse into ONE
    grouped aggregate per order — count distinct suppliers, count
    distinct late suppliers, and (because n_late = 1 is enforced in
    the filter) MAX(late supplier) is exactly that sole supplier. One
    pass, no self-join of the fact against itself per quantifier —
    strictly better than the textbook double-EXISTS plan and available
    to any engine once decorrelated.

    Scale shape: lineitem ⋈ orders shuffles on orderkey; the per-order
    aggregate reuses that clustering (no second shuffle); the supplier
    name join is a broadcast; the top-20 is TakeOrderedAndProject with
    a unique tie-break."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = F.col("l_shipdate").cast("date") > F.date_add(
        F.col("o_orderdate").cast("date"), 60
    )
    per_order = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("late"), F.col("l_suppkey"))
            ).alias("n_late"),
            F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias(
                "sole_late_supp"
            ),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        per_order.join(
            F.broadcast(supp), F.col("s_suppkey") == F.col("sole_late_supp")
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22 shape — idle customer outreach (scalar avg + NOT EXISTS anti join)
# --------------------------------------------------------------------------

_Q22_CUTOFF = "1999-01-01"
_Q22_NATIONS = (0, 2, 4, 6, 8)

_Q22_SQL = f"""
WITH avg_bal AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS ab
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_nationkey IN {_Q22_NATIONS!r}
  AND c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND CAST(o_orderdate AS DATE) >= DATE '{_Q22_CUTOFF}')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@query("idle_customer_outreach", _Q22_SQL)
def q_idle_customer_outreach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-idle customers per country —
    acctbal above the global positive-balance average (scalar
    subquery), in a target nation list, with NO recent orders
    (NOT EXISTS). The driver star has no c_phone, so the country-code
    substring becomes c_nationkey membership; "has never placed an
    order" relaxes to "no order since {_Q22_CUTOFF}" so the predicate
    is selective rather than empty on the generated data.

    Scale shape: the scalar average is a 1-row broadcast (exact
    decimal sum / count, so the > boundary is bit-stable); NOT EXISTS
    is a LEFT ANTI join against recent orders pruned to the customer
    key; the final aggregate moves one row per nation. At 100 TB the
    anti join shuffles both sides on custkey — the same co-partitioning
    the enrichment joins already use."""
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
            "ab"
        )
    )
    recent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate").cast("date") >= F.lit(_Q22_CUTOFF).cast("date"))
        .select("o_custkey")
    )
    return (
        cust.filter(F.col("c_nationkey").isin(list(_Q22_NATIONS)))
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Q8 shape — market share trend (two-level conditional aggregate)
# --------------------------------------------------------------------------

_Q8_NATION = 7
_Q8_REGION = "ASIA"

_Q8_SQL = f"""
WITH all_rev AS (
    SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS o_year,
           CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
           s_nationkey
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE r_name = '{_Q8_REGION}'
      AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01'
                                        AND DATE '1997-12-31'
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN s_nationkey = {_Q8_NATION} THEN volume
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_lineitems
FROM all_rev
GROUP BY o_year
ORDER BY o_year
"""


@query("market_share_trend", _Q8_SQL)
def q_market_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: nation {_Q8_NATION}'s share of revenue shipped
    into the {_Q8_REGION} customer region, per year — the 6-way
    snowflake join feeding a conditional-share aggregate.

    Scale shape: region/nation/supplier/customer are all
    broadcast-eligible dims (region+nation hinted; the region filter
    prunes nation BEFORE the fact join sees it); the one fact-fact
    shuffle is lineitem ⋈ orders on orderkey with the 2-year date
    window pushed into the orders scan. The share is a ratio of two
    exact-decimal sums per year — order-independent."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(
            F.col("o_orderdate")
            .cast("date")
            .between(F.lit("1996-01-01").cast("date"), F.lit("1997-12-31").cast("date"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_regionkey")
    region = (
        load_table(spark, "region", sf_dir)
        .filter(F.col("r_name") == _Q8_REGION)
        .select("r_regionkey")
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    nat_vol = F.when(F.col("s_nationkey") == _Q8_NATION, vol).otherwise(zero)
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.year(F.col("o_orderdate").cast("date")).cast("long").alias("o_year")
        )
        .agg(
            (F.sum(nat_vol).cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("o_year")
    )
