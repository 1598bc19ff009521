"""Round-4 wave 17: two remaining Spark-4 API surfaces —

- parameterized SQL (``spark.sql(query, args=...)``): named-parameter
  binding instead of string interpolation — the injection-safe,
  plan-cache-friendly way a service front-end issues the same query
  shape with varying literals;
- native XML (``to_xml`` / ``from_xml``): the third semi-structured
  codec next to JSON (from_json throughout) and VARIANT
  (variant_props_rollup) — a full render→parse round trip whose
  extracted values must equal the source rows.

Reference framing: the reference interpolates its GraphQL variables as
a JSON payload (monarchmoney.py builds ``variables`` dicts per query);
parameterized SQL is the engine-side analog of that discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dieter___etl___monarchmoney_spark.registry import query
from dieter___etl___monarchmoney_spark.sources.parquet import load_table


# --------------------------------------------------------------------------
# Parameterized SQL: named-parameter binding
# --------------------------------------------------------------------------

_PARAM_ETYPE = "purchase"
_PARAM_MINV = 50.0

_PARAM_SQL = f"""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_big_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
WHERE event_type = '{_PARAM_ETYPE}' AND value >= {_PARAM_MINV}
GROUP BY user_id
ORDER BY user_id
"""


@query("parameterized_sql_filter", _PARAM_SQL)
def q_parameterized_sql_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL: the predicate literals bind via
    ``spark.sql(..., args={...})`` markers (``:etype``, ``:minv``)
    instead of f-string interpolation — no injection surface, and the
    parse tree is stable across argument values (the property a
    query-service front-end needs for plan caching). The oracle is the
    same query with the literals inlined, so a green row proves the
    bound parameters reach the predicate unchanged.

    Scale shape: identical to the literal form — Catalyst folds the
    bound constants before optimization, so pushdown/pruning see plain
    literals (the parameter marker costs nothing at the scan)."""
    load_table(spark, "events", sf_dir).createOrReplaceTempView("events_p17")
    return spark.sql(
        """
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_big_purchases,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events_p17
        WHERE event_type = :etype AND value >= :minv
        GROUP BY user_id
        ORDER BY user_id
        """,
        args={"etype": _PARAM_ETYPE, "minv": _PARAM_MINV},
    )


# --------------------------------------------------------------------------
# Native XML: render -> parse round trip
# --------------------------------------------------------------------------

_XML_SQL = """
SELECT event_id, event_type, CAST(value AS DOUBLE) AS value
FROM events
WHERE event_type IN ('purchase', 'signup')
ORDER BY event_id
"""


@query("xml_roundtrip_extract", _XML_SQL)
def q_xml_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML codec round trip: each event renders to an XML
    element via ``to_xml(struct(...))``, then ``from_xml`` parses it
    back against an explicit schema, and the EXTRACTED fields are the
    query's output — which must equal a plain projection of the source
    (the oracle). A codec is only trustworthy if decode(encode(x)) is
    the identity; this query makes that property a hash-checked row,
    the same round-trip discipline as the JSON sink and the VARIANT
    query.

    Scale shape: both directions are per-row expressions inside
    whole-stage codegen — no shuffle, no Python; schema-explicit
    from_xml (never schema inference on a 100 TB table). The DOUBLE
    value column round-trips through XML text: Spark renders doubles
    with round-trippable precision, and the parse returns the
    identical IEEE value — pinned by the oracle hash against the
    never-serialized original."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("purchase", "signup")
    )
    xml = ev.select(
        F.to_xml(
            F.struct(
                F.col("event_id"),
                F.col("event_type"),
                F.col("value").cast("double").alias("value"),
            ),
            {"rootTag": "event"},
        ).alias("x")
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    parsed = xml.select(F.from_xml(F.col("x"), schema).alias("e"))
    return parsed.select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
    ).orderBy("event_id")
