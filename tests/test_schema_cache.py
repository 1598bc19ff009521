"""The load_table inferred-schema memo (round 12 optimization): reads
must be byte-identical to inference-per-call, the memo must be hit on
repeat loads, and a swapped/modified data file must invalidate it."""

from __future__ import annotations

import os
import shutil

from conftest import SF_SMOKE

from dieter___etl___monarchmoney_spark.sources import parquet as P


def test_cached_schema_matches_fresh_inference(spark):
    for name in ("lineitem", "events", "embeddings", "nation"):
        path = os.path.join(SF_SMOKE, f"{name}.parquet")
        fresh = spark.read.parquet(path).schema
        assert P._cached_schema(spark, path) == fresh


def test_repeat_load_hits_memo(spark):
    path = os.path.join(SF_SMOKE, "part.parquet")
    P._cached_schema(spark, path)
    key_count = len(P._SCHEMA_CACHE)
    df1 = P.load_table(spark, "part", SF_SMOKE)
    df2 = P.load_table(spark, "part", SF_SMOKE)
    assert len(P._SCHEMA_CACHE) == key_count  # no new entries
    assert df1.schema == df2.schema
    # and the data itself still comes from the file, not any memo
    assert df1.count() == df2.count() > 0


def test_modified_file_invalidates(spark, tmp_path):
    src = os.path.join(SF_SMOKE, "nation.parquet")
    dst_dir = tmp_path / "sfcopy"
    dst_dir.mkdir()
    dst = str(dst_dir / "nation.parquet")
    shutil.copyfile(src, dst)
    s1 = P._cached_schema(spark, dst)
    n1 = len(P._SCHEMA_CACHE)
    # same fingerprint -> memo hit, no growth
    P._cached_schema(spark, dst)
    assert len(P._SCHEMA_CACHE) == n1
    # swap the file for a different table's bytes: fingerprint changes,
    # the memo must re-infer the NEW schema rather than serve the old
    shutil.copyfile(os.path.join(SF_SMOKE, "region.parquet"), dst)
    os.utime(dst)  # ensure mtime_ns moves even on coarse filesystems
    s2 = P._cached_schema(spark, dst)
    assert len(P._SCHEMA_CACHE) == n1 + 1
    assert s1 != s2
    assert s2 == spark.read.parquet(dst).schema


def test_events_contract_unchanged(spark):
    df = P.load_table(spark, "events", SF_SMOKE)
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    assert df.schema["ts_ns"].dataType.simpleString() == "bigint"
