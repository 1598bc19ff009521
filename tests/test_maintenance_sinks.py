"""Maintenance CRUD (M1) + sink (K1-K6) + JSON-ingest (S1/F14) tests."""

from __future__ import annotations

from pyspark.sql import Row

from dieter___etl___monarchmoney_spark.operators.maintenance import (
    delete_rows,
    insert_rows,
    update_field_where,
    update_splits,
    upsert_rows,
)
from dieter___etl___monarchmoney_spark.sources.json_ingest import (
    ingest_documents,
    unwrap_envelope,
)
from dieter___etl___monarchmoney_spark.sources.sinks import (
    ensure_table,
    read_sink,
    truncate_table,
    write_table,
)


def _tbl(spark):
    return spark.createDataFrame(
        [("t1", 10.0, "a"), ("t2", 20.0, "b"), ("t3", 30.0, "a")],
        ["id", "amount", "cat"],
    )


def test_upsert_insert_delete(spark):
    t = _tbl(spark)
    up = spark.createDataFrame([("t2", 99.0, "z"), ("t9", 1.0, "n")], ["id", "amount", "cat"])
    got = {r["id"]: (r["amount"], r["cat"]) for r in upsert_rows(t, up, "id").collect()}
    assert got["t2"] == (99.0, "z") and got["t9"] == (1.0, "n") and len(got) == 4

    ins = spark.createDataFrame([("t1", 0.0, "dup"), ("t4", 4.0, "c")], ["id", "amount", "cat"])
    got = {r["id"]: r["cat"] for r in insert_rows(t, ins, "id").collect()}
    assert got["t1"] == "a"  # existing id NOT overwritten
    assert got["t4"] == "c" and len(got) == 4

    got = {r["id"] for r in delete_rows(t, ["t1", "t3"], "id").collect()}
    assert got == {"t2"}
    assert delete_rows(t, [], "id").count() == 3  # empty list -> no-op


def test_update_field_and_splits(spark):
    t = _tbl(spark)
    got = {r["id"]: r["cat"] for r in update_field_where(t, "id", ["t1", "t3"], "cat", "x").collect()}
    assert got == {"t1": "x", "t2": "b", "t3": "x"}

    txns = spark.createDataFrame(
        [("p1", None, 100.0), ("s1", "p1", 40.0), ("s2", "p1", 60.0), ("p2", None, 5.0)],
        ["txn_id", "parent_id", "amount"],
    )
    new_splits = spark.createDataFrame(
        [("s3", "p1", 30.0), ("s4", "p1", 70.0)], ["txn_id", "parent_id", "amount"]
    )
    got = {r["txn_id"] for r in update_splits(txns, "p1", new_splits).collect()}
    assert got == {"p1", "p2", "s3", "s4"}


def test_sinks_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t")
    t = _tbl(spark)
    write_table(t, p)
    assert read_sink(spark, p).count() == 3
    truncate_table(spark, p)
    back = read_sink(spark, p)
    assert back.count() == 0 and back.schema == t.schema  # K6: empty, same schema
    # K5 ensure_table bootstraps missing paths
    p2 = str(tmp_path / "fresh")
    assert ensure_table(spark, p2, t).count() == 0
    assert read_sink(spark, p2).schema == t.schema


def test_ingest_and_unwrap(spark):
    # results-wrapped page (the reference's _unwrap_transactions shapes)
    page = {"results": [{"id": "t1", "amount": 5.0}, {"id": "t2", "amount": 6.0}]}
    df = ingest_documents(spark, [page])
    flat = unwrap_envelope(df)
    assert sorted(r["id"] for r in flat.collect()) == ["t1", "t2"]
    # edges/node connection (holdings, monarchmoney.py:731-777)
    conn = {"edges": [{"node": {"id": "h1", "qty": 2.0}}, {"node": {"id": "h2", "qty": 3.0}}]}
    flat = unwrap_envelope(ingest_documents(spark, [conn]))
    assert sorted(r["id"] for r in flat.collect()) == ["h1", "h2"]
    # no envelope -> passthrough
    plain = ingest_documents(spark, [{"id": "x", "v": 1}])
    assert unwrap_envelope(plain).collect()[0]["id"] == "x"


def test_write_sorted_table_range_partitioned(spark, tmp_path):
    """Sorted output via range partitioning: files hold disjoint,
    ascending key ranges (total order at merge-read) and the write plan
    has no single-partition funnel."""
    import os

    from pyspark.sql import functions as F

    from dieter___etl___monarchmoney_spark.sources.sinks import write_sorted_table

    df = spark.range(0, 10_000).select(
        (F.col("id") * 37 % 10_000).alias("k"), F.col("id").alias("v")
    )
    out = str(tmp_path / "sorted")
    write_sorted_table(df, out, "k", n_files=8)

    files = sorted(
        f for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert 1 < len(files) <= 8
    # per-file key ranges must be disjoint and ascending once ordered
    # by their min key — that IS the global-order contract
    ranges = []
    for f in files:
        stats = (
            spark.read.parquet(os.path.join(out, f))
            .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
            .collect()[0]
        )
        ranges.append((stats["lo"], stats["hi"]))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # nothing lost
    assert spark.read.parquet(out).count() == 10_000

    plan = df.repartitionByRange(8, F.col("k"))._jdf.queryExecution().toString()
    assert "SinglePartition" not in plan


def test_compact_table_reduces_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from dieter___etl___monarchmoney_spark.sources.sinks import compact_table

    out = str(tmp_path / "fragmented")
    # simulate 20 micro-batch appends -> >=20 small files
    for i in range(20):
        spark.range(i * 10, i * 10 + 10).select(
            F.col("id"), (F.col("id") * 2).alias("doubled")
        ).coalesce(1).write.mode("append").parquet(out)

    manifest = compact_table(spark, out, target_files=4)
    assert manifest["files_before"] >= 20
    assert manifest["files_after"] <= 4
    compacted = spark.read.parquet(out)
    assert compacted.count() == 200
    assert compacted.agg(F.sum("doubled")).collect()[0][0] == sum(
        2 * x for x in range(200)
    )


def test_compact_table_preserves_multilevel_layout(spark, tmp_path):
    """Compaction of a two-level hive layout (a=.../b=...) must rewrite
    partitionBy BOTH levels — detecting only the first silently
    flattened the second (ADVICE r7)."""
    import os

    from pyspark.sql import functions as F

    from dieter___etl___monarchmoney_spark.sources.sinks import compact_table

    out = str(tmp_path / "two_level")
    df = spark.createDataFrame(
        [(i, f"2024-{1 + i % 2:02d}", f"s{i % 3}") for i in range(60)],
        ["id", "month", "src"],
    )
    for _ in range(3):  # fragment it
        df.write.mode("append").partitionBy("month", "src").parquet(out)

    manifest = compact_table(spark, out)
    assert manifest["files_after"] < manifest["files_before"]
    # both levels survive on disk
    lvl1 = [d for d in os.listdir(out) if d.startswith("month=")]
    assert sorted(lvl1) == ["month=2024-01", "month=2024-02"]
    for d in lvl1:
        lvl2 = [s for s in os.listdir(os.path.join(out, d)) if s.startswith("src=")]
        assert sorted(lvl2) == ["src=s0", "src=s1", "src=s2"]
    back = spark.read.parquet(out)
    assert back.count() == 180
    assert set(back.columns) == {"id", "month", "src"}


def test_expire_partitions_metadata_only(spark, tmp_path):
    """Retention drops only pre-cutoff partition directories; surviving
    data is untouched (same files, same rows)."""
    import os

    from pyspark.sql import functions as F

    from dieter___etl___monarchmoney_spark.sources.sinks import expire_partitions

    out = str(tmp_path / "retained")
    df = spark.createDataFrame(
        [(i, f"2024-{m:02d}") for m in range(1, 7) for i in range(10 * m, 10 * m + 5)],
        ["id", "txn_month"],
    )
    df.write.partitionBy("txn_month").parquet(out)
    before_files = {
        d: sorted(os.listdir(os.path.join(out, d)))
        for d in os.listdir(out)
        if d.startswith("txn_month=")
    }

    manifest = expire_partitions(spark, out, "txn_month", "2024-04")
    assert manifest["dropped"] == ["2024-01", "2024-02", "2024-03"]
    assert manifest["kept"] == ["2024-04", "2024-05", "2024-06"]

    left = spark.read.parquet(out)
    assert left.count() == 15
    assert left.agg(F.min("txn_month")).collect()[0][0] == "2024-04"
    # surviving partition dirs untouched: identical file listings
    for d in ("txn_month=2024-04", "txn_month=2024-05", "txn_month=2024-06"):
        assert sorted(os.listdir(os.path.join(out, d))) == before_files[d]
