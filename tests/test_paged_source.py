"""Custom paged-JSON Data Source (sources/paged_source.py): page =
partition planning, full-scan correctness, schema contract, and the
connector-edge composition with the envelope unwrap."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.sources.paged_source import (
    PagedJsonDataSource,
    register,
)


@pytest.fixture(scope="module")
def payload(tmp_path_factory):
    path = tmp_path_factory.mktemp("paged") / "txns.jsonl"
    with open(path, "w") as f:
        for i in range(1234):
            f.write(
                json.dumps(
                    {"id": f"t{i:04d}", "amount": float(i) / 4, "category": f"c{i % 7}"}
                )
                + "\n"
            )
    return str(path)


SCHEMA = "id string, amount double, category string"


def test_pages_become_partitions(spark, payload):
    register(spark)
    df = (
        spark.read.format("paged_json")
        .schema(SCHEMA)
        .option("path", payload)
        .option("pageSize", 500)
        .load()
    )
    # 1234 records at 500/page -> 3 page partitions, fetched in parallel
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 1234
    # no dupes, no drops at page boundaries
    assert df.select("id").distinct().count() == 1234
    row = df.filter(F.col("id") == "t0500").collect()[0]
    assert row["amount"] == 125.0


def test_max_partitions_packs_consecutive_pages(spark, payload):
    """Past the maxPartitions cap, consecutive pages pack into one task
    (a contiguous byte range — one seek, several pages) so page count
    stops dictating task count. 1234 records at 100/page = 13 pages;
    maxPartitions=5 -> ceil(13/5)=3 pages/task -> 5 partitions — with
    zero drops or duplicates at either page or pack boundaries."""
    register(spark)
    df = (
        spark.read.format("paged_json")
        .schema(SCHEMA)
        .option("path", payload)
        .option("pageSize", 100)
        .option("maxPartitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 1234
    assert df.select("id").distinct().count() == 1234
    # a record in the middle of a packed range survives with its values
    row = df.filter(F.col("id") == "t0707").collect()[0]
    assert row["amount"] == 707 / 4
    with pytest.raises(Exception):
        (
            spark.read.format("paged_json")
            .schema(SCHEMA)
            .option("path", payload)
            .option("maxPartitions", 0)
            .load()
            .count()
        )


def test_small_final_page_and_aggregate(spark, payload):
    register(spark)
    df = (
        spark.read.format("paged_json")
        .schema(SCHEMA)
        .option("path", payload)
        .option("pageSize", 1000)
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # 1000 + 234
    by_cat = {
        r["category"]: r["n"]
        for r in df.groupBy("category").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(by_cat.values()) == 1234 and len(by_cat) == 7


def test_schema_contract_required(spark, payload):
    register(spark)
    with pytest.raises(Exception, match="schema"):
        spark.read.format("paged_json").option("path", payload).load().count()


def test_missing_keys_tolerated(spark, tmp_path):
    """U2 — a record missing a declared column yields NULL, the typed
    analog of the reference's dynamic key-union."""
    path = str(tmp_path / "sparse.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"id": "a", "amount": 1.0}) + "\n")
        f.write(json.dumps({"id": "b", "category": "x"}) + "\n")
    register(spark)
    rows = (
        spark.read.format("paged_json")
        .schema(SCHEMA)
        .option("path", path)
        .load()
        .orderBy("id")
        .collect()
    )
    assert rows[0]["category"] is None
    assert rows[1]["amount"] is None


def test_register_idempotent(spark):
    register(spark)
    register(spark)  # second call must not raise
    assert PagedJsonDataSource.name() == "paged_json"


def test_filter_pushdown_results_and_plan(spark, payload):
    """Pushed predicates (range + IN + equality) produce exactly the
    rows Spark-side filtering would, and the scan plan records them as
    pushed rather than post-scan filters."""
    register(spark)
    base = (
        spark.read.format("paged_json")
        .schema(SCHEMA)
        .option("path", payload)
        .option("pageSize", 500)
        .option("filterPushdown", "true")
        .load()
    )
    cond = (
        (F.col("amount") > 100.0)
        & (F.col("amount") <= 150.0)
        & F.col("category").isin("c0", "c3")
    )
    got = sorted(r["id"] for r in base.filter(cond).collect())
    # reference computation over the raw payload
    want = sorted(
        f"t{i:04d}"
        for i in range(1234)
        if 100.0 < i / 4 <= 150.0 and f"c{i % 7}" in ("c0", "c3")
    )
    assert got == want and len(got) > 0

    # every predicate was absorbed by the source, so the PHYSICAL plan
    # has no Spark-side Filter at all — the scan is the whole pipeline
    physical = base.filter(cond)._jdf.queryExecution().executedPlan().toString()
    assert "Filter (" not in physical  # RuntimeFilters: [] is not a Filter node
    assert "BatchScan paged_json" in physical


def test_unsupported_filter_stays_spark_side(spark, payload):
    register(spark)
    base = (
        spark.read.format("paged_json")
        .schema(SCHEMA)
        .option("path", payload)
        .load()
    )
    # endswith is not a pushable predicate -> evaluated post-scan
    flt = base.filter(F.col("id").endswith("99"))
    assert flt.count() == 12  # t0099, t0199, ..., t1199
    physical = flt._jdf.queryExecution().executedPlan().toString()
    assert "Filter (" in physical  # stayed Spark-side


def test_seek_offsets_and_single_pass_io(tmp_path, monkeypatch):
    """The planning pass records each page's byte offset, and read()
    SEEKS there instead of re-scanning the file prefix: total bytes
    iterated across every page task is O(file), not O(pages² · page).
    Driven directly on the reader (no Spark session) so the byte
    accounting is exact."""
    import builtins

    from pyspark.sql.types import LongType, StructField, StructType

    import dieter___etl___monarchmoney_spark.sources.paged_source as ps

    lines = [json.dumps({"id": i}) + "\n" for i in range(1000)]
    path = tmp_path / "p.jsonl"
    path.write_text("".join(lines))
    file_size = sum(len(line) for line in lines)

    schema = StructType([StructField("id", LongType())])
    reader = ps.PagedJsonReader(schema, {"path": str(path), "pagesize": "100"})
    parts = reader.partitions()
    assert len(parts) == 10
    # each page's byte_start is exactly where its first record begins
    expected_starts = [
        sum(len(line) for line in lines[: i * 100]) for i in range(10)
    ]
    assert [p.byte_start for p in parts] == expected_starts

    counted = {"bytes": 0}
    real_open = builtins.open

    class CountingFile:
        def __init__(self, f):
            self._f = f

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            self._f.close()

        def seek(self, pos):
            return self._f.seek(pos)  # a seek reads nothing

        def __iter__(self):
            for line in self._f:
                counted["bytes"] += len(line)
                yield line

    def counting_open(p, mode="r", *a, **kw):
        return CountingFile(real_open(p, mode, *a, **kw))

    monkeypatch.setattr(builtins, "open", counting_open)
    rows = []
    for part in parts:
        rows.extend(reader.read(part))
    monkeypatch.undo()

    assert sorted(r[0] for r in rows) == list(range(1000))
    # one page per task plus at most one look-ahead line each; a prefix
    # re-scan would have iterated ~5.5x the file for 10 pages
    max_line = max(len(line) for line in lines)
    assert counted["bytes"] <= file_size + len(parts) * max_line


# --------------------------------------------------------------------------
# Writer (sink) side: commit protocol, truncate semantics, append guard
# --------------------------------------------------------------------------


def test_writer_roundtrip_and_truncate(spark, tmp_path):
    from dieter___etl___monarchmoney_spark.sources.paged_source import register

    register(spark)
    path = str(tmp_path / "sink.jsonl")
    a = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)], "id long, name string, v double"
    )
    a.write.format("paged_json").mode("overwrite").option("path", path).save()
    schema = "id long, name string, v double"
    back = (
        spark.read.format("paged_json").schema(schema).option("path", path).load()
    )
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, "b", 2.5),
        (3, "c", 3.5),
    ]
    # overwrite truncates: only the second frame's rows survive
    b = spark.createDataFrame([(9, "z", 9.9)], "id long, name string, v double")
    b.write.format("paged_json").mode("overwrite").option("path", path).save()
    back2 = (
        spark.read.format("paged_json").schema(schema).option("path", path).load()
    )
    assert [tuple(r) for r in back2.collect()] == [(9, "z", 9.9)]


def test_writer_commit_leaves_no_staging(spark, tmp_path):
    from dieter___etl___monarchmoney_spark.sources.paged_source import register

    register(spark)
    path = str(tmp_path / "clean.jsonl")
    df = spark.range(100).selectExpr("id", "CAST(id AS STRING) AS name")
    df.write.format("paged_json").mode("overwrite").option("path", path).save()
    leftovers = [p.name for p in tmp_path.iterdir() if p.name != "clean.jsonl"]
    assert leftovers == []


def test_writer_rejects_append(spark, tmp_path):
    import pytest as _pytest

    from dieter___etl___monarchmoney_spark.sources.paged_source import register

    register(spark)
    path = str(tmp_path / "appendless.jsonl")
    df = spark.range(3).selectExpr("id")
    with _pytest.raises(Exception, match="truncate\\+overwrite|PYTHON_DATA_SOURCE"):
        df.write.format("paged_json").mode("append").option("path", path).save()


def test_stream_writer_exactly_once_across_restart(spark, tmp_path):
    import glob

    from dieter___etl___monarchmoney_spark.sources.paged_source import register
    from dieter___etl___monarchmoney_spark.streaming.stream_reader import (
        read_events_stream,
    )

    register(spark)
    out, cp = str(tmp_path / "sink"), str(tmp_path / "cp")
    import os

    os.makedirs(out, exist_ok=True)
    stream = read_events_stream(spark, "/root/testdata/sf0.001").select(
        "event_id", "user_id", "event_type"
    )

    def run():
        q = (
            stream.writeStream.format("paged_json")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    schema = "event_id long, user_id long, event_type string"
    first = spark.read.schema(schema).json(out + "/epoch-*.jsonl")
    n_src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert first.count() == n_src
    assert first.select("event_id").distinct().count() == n_src
    epochs_before = sorted(glob.glob(out + "/epoch-*.jsonl"))
    # restart from the same checkpoint: no new data, no new epochs, no dups
    run()
    assert sorted(glob.glob(out + "/epoch-*.jsonl")) == epochs_before
    again = spark.read.schema(schema).json(out + "/epoch-*.jsonl")
    assert again.count() == n_src


def test_bad_record_policy(spark, tmp_path):
    from dieter___etl___monarchmoney_spark.sources.paged_source import register

    register(spark)
    path = str(tmp_path / "corrupt.jsonl")
    with open(path, "w") as f:
        f.write('{"id": 1}\n')
        f.write("{not json at all\n")
        f.write('{"id": 3}\n')
    schema = "id long"
    # default policy: the corrupt record fails the scan
    import pytest as _pytest

    with _pytest.raises(Exception):
        (
            spark.read.format("paged_json")
            .schema(schema)
            .option("path", path)
            .load()
            .collect()
        )
    # drop policy: corrupt record skipped, good records survive
    got = (
        spark.read.format("paged_json")
        .schema(schema)
        .option("path", path)
        .option("badRecordPolicy", "drop")
        .load()
        .collect()
    )
    assert sorted(r["id"] for r in got) == [1, 3]


def test_part_pid_sorts_numerically_past_padding_width():
    """The commit merge orders parts by PARSED partition id: a
    lexicographic basename sort breaks at pid >= 100000 (ADVICE r7)."""
    from dieter___etl___monarchmoney_spark.sources.paged_source import _part_pid

    paths = [
        "/x/part-100000-abcdef.jsonl",
        "/x/part-99999-abcdef.jsonl",
        "/x/part-00001-abcdef.jsonl",
    ]
    assert sorted(paths, key=_part_pid) == [paths[2], paths[1], paths[0]]
    # the lexicographic order this replaces was genuinely wrong:
    assert sorted(paths) != sorted(paths, key=_part_pid)
