"""Wave 31 (round 5): lakehouse temporal completions and the fourth
sanctioned Python lane — bitemporal as-of/as-at reconstruction,
keep-latest-N retention pruning with a content checksum, a Python
UDTF (table function) chunker measured as its own lane, and the
GROUPING_ID subtotal surface.

The UDTF joins the other sanctioned Arrow lanes (scalar
`arrow_udf_text_normalize`, grouped-agg `returnflag_quantity_iqr`,
and — twin-only since round 8 — the grouped-map
`transition_matrix_grouped_map`) as the ONLY sanctioned per-row
Python lanes in the repo: each exists to pin the API's cost and
parity, with the hot-path alternative documented alongside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table

# --------------------------------------------------------------------------
# Bitemporal as-of / as-at reconstruction
# --------------------------------------------------------------------------

#: deterministic simulated ingestion delay: event_id % 49 hours — a
#: skewed late-arrival distribution (up to 2 days) derived from data
#: already present, so both engines see identical transaction times.
_ARRIVAL_SQL = "ts + to_hours(event_id % 49)"
_AS_OF_VALID = "2024-01-15 00:00:00"  # valid-time cutoff V
#: transaction-time cutoff T sits only 12h past V while arrival delays
#: run up to 48h — so a slice of facts valid before V had NOT yet
#: arrived at T and must be invisible. (With T ≥ V + max-delay the
#: transaction axis would never bite; the unit test pins that the
#: bitemporal winner differs from the valid-only winner somewhere.)
_AS_AT_TX = "2024-01-15 12:00:00"

_BITEMPORAL_SQL = f"""
WITH versioned AS (
    SELECT user_id, event_type, value, ts,
           {_ARRIVAL_SQL} AS arrival_ts, event_id
    FROM events
),
known AS (
    SELECT * FROM versioned
    WHERE ts <= TIMESTAMP '{_AS_OF_VALID}'
      AND arrival_ts <= TIMESTAMP '{_AS_AT_TX}'
),
latest AS (
    SELECT user_id, event_type, value,
           epoch_us(ts) AS valid_us, epoch_us(arrival_ts) AS tx_us,
           row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM known
)
SELECT user_id, event_type, value, valid_us, tx_us
FROM latest WHERE rn = 1
ORDER BY user_id, event_type
"""


@query("bitemporal_as_of_as_at", _BITEMPORAL_SQL)
def q_bitemporal_as_of_as_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal state reconstruction — the lakehouse question
    `scd2_history` (valid time) and `cdc_latest_state` (latest only)
    cannot answer alone: *what did we believe the state AS OF valid
    time V was, AS AT transaction time T?* Transaction time is a
    deterministic simulated ingestion delay (event_id % 49 hours), so
    late-arriving facts visible at T but valid before V are included
    while facts that had not yet ARRIVED at T are excluded — exactly
    the reproducible-training-snapshot guarantee
    `pit_training_features` needs, here generalized to two axes.

    Scale shape: two pushdown-friendly timestamp range predicates
    filter the scan, then one keep-latest window per (user, type) —
    the cdc_latest_state plan with a second filter; timestamps emit
    as epoch-micros BIGINTs per the hashing contract."""
    events = load_table(spark, "events", sf_dir)
    versioned = events.withColumn(
        "arrival_ts",
        F.col("ts") + F.make_interval(hours=F.col("event_id") % 49),
    )
    known = versioned.filter(
        (F.col("ts") <= F.lit(_AS_OF_VALID).cast("timestamp"))
        & (F.col("arrival_ts") <= F.lit(_AS_AT_TX).cast("timestamp"))
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        known.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("valid_us"),
            F.unix_micros("arrival_ts").alias("tx_us"),
        )
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# Keep-latest-N retention pruning with content checksum
# --------------------------------------------------------------------------

_RETENTION_N = 3

_RETENTION_SQL = f"""
WITH ranked AS (
    SELECT event_type, event_id,
           row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN rn <= {_RETENTION_N} THEN 1 ELSE 0 END) AS BIGINT)
           AS kept_rows,
       CAST(SUM(CASE WHEN rn > {_RETENTION_N} THEN 1 ELSE 0 END) AS BIGINT)
           AS pruned_rows,
       CAST(SUM(CASE WHEN rn <= {_RETENTION_N} THEN
            list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(
                    substr(md5(CAST(event_id AS VARCHAR)), 1, 8), ''),
                ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT))),
                (acc, d) -> acc * 16 + d)
            ELSE 0 END) AS BIGINT) AS kept_checksum
FROM ranked GROUP BY event_type ORDER BY event_type
"""


@query("retention_policy_prune", _RETENTION_SQL)
def q_retention_policy_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-{n} retention policy audit: per event type, how
    many rows a keep-N-versions-per-(user, type) policy retains and
    prunes, plus an order-insensitive checksum of the KEPT set — the
    dry-run every lakehouse VACUUM/retention job should emit before
    deleting, so the kept content is verifiable against the replica
    (`partition_checksum_diff`'s repair contract applied to
    retention).

    One rank window per (user, type) — bounded partitions — and one
    conditional partial aggregate; the checksum reuses the
    32-bit-bounded md5-prefix row hash (BIGINT-exact at any
    scale).""".format(n=_RETENTION_N)
    from dieter___etl___monarchmoney_spark.queries.wave27_ops import _row_hash

    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = events.select(
        "event_type", "event_id", F.row_number().over(w).alias("rn")
    )
    keep = F.col("rn") <= _RETENTION_N
    return (
        ranked.groupBy("event_type")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("kept_rows"),
            F.sum(F.when(~keep, 1).otherwise(0))
            .cast("bigint")
            .alias("pruned_rows"),
            F.sum(F.when(keep, _row_hash(F.col("event_id"))).otherwise(0))
            .cast("bigint")
            .alias("kept_checksum"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Python UDTF chunker — the fourth sanctioned Python lane
# --------------------------------------------------------------------------

_CHUNK_SIZE = 40

_UDTF_CHUNK_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\s+'),
                       t -> t <> '') AS tk
    FROM documents
)
SELECT doc_id,
       CAST(i - 1 AS BIGINT) AS chunk_id,
       CAST(len(tk[(i - 1) * {_CHUNK_SIZE} + 1 : i * {_CHUNK_SIZE}]) AS BIGINT)
           AS n_tokens,
       md5(array_to_string(
           tk[(i - 1) * {_CHUNK_SIZE} + 1 : i * {_CHUNK_SIZE}], ' '))
           AS chunk_fp
FROM toks,
     unnest(generate_series(
         1, CAST(ceil(len(tk) / {_CHUNK_SIZE}.0) AS BIGINT))) AS u(i)
WHERE len(tk) > 0
ORDER BY doc_id, chunk_id
"""


@query("udtf_chunk_explode", _UDTF_CHUNK_SQL)
def q_udtf_chunk_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document → fixed-{n}-token chunk rows through a PYTHON UDTF in
    a LATERAL join — the fourth sanctioned Python lane (the
    table-function API the scalar/grouped Arrow lanes don't cover),
    Arrow-batched (ArrowEvalPythonUDTF — the plan-hygiene test pins
    that no row-pickling BatchEvalPython node appears), registered
    once per session and invoked per input row. Output is (doc_id,
    chunk_id, n_tokens, md5 fingerprint), so the hash certifies the
    UDTF's row fan-out AND its chunk contents against the pure-SQL
    twin.

    Hot-path note (same contract as the other lanes): the JVM-side
    equivalent is `chunk_sliding_windows`' sequence+slice expression —
    this lane exists to pin the UDTF API's semantics and measured
    cost, not to recommend it for 100 TB chunking. The UDTF is
    stateless and per-row (no partition-level state), so Spark
    parallelizes it like any projection; chunk fingerprints are
    md5-of-joined-tokens, bit-identical to the SQL twin because
    Python's whitespace split equals the \\s+ regex filter
    semantics.""".format(n=_CHUNK_SIZE)
    import hashlib

    from pyspark.sql.functions import udtf

    # defined lazily: a module-level UDTF with a DDL-string return type
    # parses against the active session at import time (engine-gotchas)
    @udtf(
        returnType="chunk_id: bigint, n_tokens: bigint, chunk_fp: string",
        useArrow=True,
    )
    class ChunkUDTF:
        def eval(self, text: str):
            toks = [t for t in text.lower().strip().split() if t]
            for i in range(0, len(toks), _CHUNK_SIZE):
                chunk = toks[i : i + _CHUNK_SIZE]
                yield (
                    i // _CHUNK_SIZE,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    # useArrow=True on the decorator (resolved at DECORATION time, so a
    # session conf set later in this function would not take): the plan
    # node is ArrowEvalPythonUDTF, not the row-pickling BatchEval form —
    # pinned by test_whole_registry_plan_hygiene
    spark.udtf.register("wave31_chunker", ChunkUDTF)
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    docs.createOrReplaceTempView("wave31_chunk_docs")
    return spark.sql(
        """SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk_fp
           FROM wave31_chunk_docs d, LATERAL wave31_chunker(d.text) c
           ORDER BY d.doc_id, c.chunk_id"""
    )


# --------------------------------------------------------------------------
# GROUPING_ID subtotal surface
# --------------------------------------------------------------------------

_GROUPING_ID_SQL = """
SELECT COALESCE(r.r_name, '(all)') AS region_name,
       COALESCE(n.n_name, '(all)') AS nation_name,
       CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS BIGINT)
           AS grouping_id,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_balance
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY grouping_id, region_name, nation_name
"""


@query("grouping_id_rollup_report", _GROUPING_ID_SQL)
def q_grouping_id_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation) with GROUPING_ID disambiguating
    subtotal rows from real '(all)'-named groups — the piece of the
    grouping-sets surface `budget_grouping_sets` and `cashflow_cube`
    don't exercise: the grouping FLAG itself as an output column
    (Spark `F.grouping` ↔ SQL GROUPING()), which downstream report
    layers key on to style subtotal rows.

    One pass, map-side partial aggregation across all three grouping
    sets; dims broadcast; balances through the DECIMAL(18,6) money
    contract."""
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            (F.grouping("r_name") * 2 + F.grouping("n_name"))
            .cast("bigint")
            .alias("grouping_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_balance"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation_name"),
            "grouping_id",
            "n_customers",
            "total_balance",
        )
        .orderBy("grouping_id", "region_name", "nation_name")
    )
