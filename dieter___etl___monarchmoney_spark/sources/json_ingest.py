"""Nested-JSON document ingestion (SURVEY.md §2.1 S1, §2.8 F13/F14):
the connector edge where GraphQL-shaped responses become DataFrames.

The reference fetches nested JSON and unwraps the connection envelope in
Python (`_unwrap_transactions` MonarchMoneyMain-v3.py:243-288,
`_extract_connection` :306-342 — tries data/edges/nodes/items/results).
Here the same tolerance is schema-driven: permissive JSON parse, then
envelope probing over known wrapper keys.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: envelope keys the reference probes, in order (MonarchMoneyMain-v3.py:306-342)
WRAPPER_KEYS = ("results", "nodes", "items", "edges", "data")


class NonRetryableError(Exception):
    """A PERMANENT failure (auth rejection, malformed query, GraphQL
    validation error): ``with_retries`` re-raises it immediately —
    re-POSTing a doomed request 3× per page just hammers the endpoint
    before the same failure surfaces."""


def with_retries(fn, *, attempts: int = 3, delay_s: float = 5.0, sleep=None):
    """T6 — transport retry policy (3 attempts, 5 s sleep,
    MonarchMoneyMain-v3.py:1058-1082). Connector-edge concern: wraps the
    driver-side fetch that produces the documents; Spark task retries
    cover execution-side failures. ``sleep`` is injectable for tests.
    ``NonRetryableError`` (and causes the callable classifies as such)
    fail fast instead of burning the retry budget."""
    import time as _time

    sleep = sleep or _time.sleep
    last = None
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except NonRetryableError:
            raise
        except Exception as exc:  # noqa: BLE001 — transport errors are opaque
            last = exc
            if attempt < attempts:
                sleep(delay_s)
    raise last


def ingest_documents(
    spark: SparkSession, docs: Sequence[dict], schema: T.StructType | None = None
) -> DataFrame:
    """S1 — driver-side fetched documents → DataFrame. With no schema,
    infer permissively via the JSON reader (unknown fields tolerated —
    the reference's dynamic key-union, U2)."""
    rdd_less = spark.createDataFrame(
        [(json.dumps(d),) for d in docs], T.StructType([T.StructField("j", T.StringType())])
    )
    if schema is None:
        # infer from the payload itself (driver-side sample is the payload)
        sample = spark.read.json(rdd_less.rdd.map(lambda r: r["j"]))
        return sample
    return rdd_less.select(F.from_json("j", schema).alias("d")).select("d.*")


def unwrap_envelope(df: DataFrame, node_field: str = "node") -> DataFrame:
    """F14 — generic connection unwrap: find the first known wrapper
    column holding an array and explode it; edges additionally lift
    ``node.*``."""
    for key in WRAPPER_KEYS:
        if key in df.columns and isinstance(df.schema[key].dataType, T.ArrayType):
            exploded = df.select(F.explode(F.col(key)).alias("_e"))
            elem = df.schema[key].dataType.elementType
            if (
                key == "edges"
                and isinstance(elem, T.StructType)
                and node_field in elem.fieldNames()
            ):
                return exploded.select(F.col(f"_e.{node_field}.*"))
            return exploded.select("_e.*")
    return df
