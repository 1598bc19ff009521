"""Remaining filter-surface coverage (SURVEY.md §2.2): substring search
(P3), tri-state boolean flag chain (P5), soft-delete toggle (P6),
null-safe coalesce (P9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.operators.transactions import transactions_query
from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table
from dieter___etl___monarchmoney_spark.sources.star_model import (
    TRANSACTIONS_SQL,
    transactions,
)


@query(
    "document_search",
    """
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE (contains(text, 'spark') OR contains(source, 'spark'))
      AND lang IN ('en', 'es')
    """,
)
def q_document_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 + P4 — substring search over an explicit column set plus an
    IN-list (search variable, monarchmoney.py:1514-1518). The predicate
    is a plain Column expression → pushed into the scan."""
    docs = load_table(spark, "documents", sf_dir)
    searched = transactions_query(
        docs.withColumn("txn_date", F.lit(None).cast("date")),  # satisfy API shape
        search="spark",
        search_columns=("text", "source"),
    )
    return searched.filter(F.col("lang").isin("en", "es")).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "tri_state_flag_chain",
    f"""
    SELECT txn_id, amount, returnflag, linestatus
    FROM ({TRANSACTIONS_SQL})
    WHERE returnflag = 'R' AND linestatus = 'F'
    """,
)
def q_tri_state_flag_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — tri-state boolean filters: flags set to None contribute no
    predicate (absent ⇒ no filter, monarchmoney.py:1522-1542); here two
    set flags and two absent ones build the chain."""
    txns = transactions(spark, sf_dir)
    page = transactions_query(
        txns,
        flags={
            "returnflag": "R",
            "linestatus": "F",
            "pending": None,  # absent -> ignored
            "isRecurring": None,  # absent -> ignored
        },
    )
    return page.select("txn_id", "amount", "returnflag", "linestatus")


@query(
    "soft_delete_toggle",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type <> 'error'
    """,
)
def q_soft_delete_toggle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — default-on exclusion filter, disabled by flag
    (includeDeleted monarchmoney.py:1037; hidden holdings :784):
    'error' events play the soft-deleted rows."""
    events = load_table(spark, "events", sf_dir)

    def scan(include_deleted: bool) -> DataFrame:
        df = events
        if not include_deleted:
            df = df.filter(F.col("event_type") != "error")
        return df

    return scan(include_deleted=False).select("event_id", "user_id", "event_type", "value")


@query(
    "json_field_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
)
def q_json_field_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11/F12 at scan scale — stringified-JSON field extraction with a
    predicate on the extracted value (the reference json.loads's
    stringified structs, MonarchMoneyMain-v3.py:444-449)."""
    events = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.select("event_id", k.alias("k_value"), "event_type")
        .filter(F.col("k_value") >= 50)
    )


@query(
    "coalesce_candidates",
    """
    SELECT event_id,
           COALESCE(NULLIF(props, ''), event_type, 'unknown') AS resolved
    FROM events
    """,
)
def q_coalesce_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — null-safe coalescing across candidate fields
    (_txn_account_id MonarchMoneyMain-v3.py:290-304)."""
    events = load_table(spark, "events", sf_dir)
    return events.select(
        "event_id",
        F.coalesce(
            F.nullif(F.col("props"), F.lit("")), F.col("event_type"), F.lit("unknown")
        ).alias("resolved"),
    )
