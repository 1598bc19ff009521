"""shared_materialized safety properties: concurrent-publish race,
fingerprint failure on missing sources, crash-garbage recovery.

The race test simulates the two-process interleaving in-process: the
loser's build() publishes the winner's table into `base` before the
loser's own rename runs, so the loser's rename collides and the
first-writer-wins fallback must kick in (ADVICE r6 medium).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest

from dieter___etl___monarchmoney_spark.sources.materialize import (
    shared_materialized,
    source_fingerprint,
)

SF = "/root/testdata/sf0.001"


def _base(tag: str) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        f"shared_{tag}_{source_fingerprint(SF, 'region')}",
    )


def test_fingerprint_missing_source_raises():
    with pytest.raises(FileNotFoundError):
        source_fingerprint(SF, "region", "no_such_table")


def test_fingerprint_changes_with_source_set():
    assert source_fingerprint(SF, "region") != source_fingerprint(SF, "nation")


def test_cold_build_then_cache_hit(spark):
    tag = f"t_{uuid.uuid4().hex[:8]}"
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).withColumnRenamed("id", "v")

    try:
        out1 = shared_materialized(spark, SF, tag, ("region",), build)
        assert out1.count() == 5
        out2 = shared_materialized(spark, SF, tag, ("region",), build)
        assert out2.count() == 5
        assert len(calls) == 1, "second call must hit the published table"
    finally:
        shutil.rmtree(_base(tag), ignore_errors=True)


def test_publish_race_loser_reads_winner(spark):
    tag = f"t_{uuid.uuid4().hex[:8]}"
    base = _base(tag)

    def winner_publish():
        stage = tempfile.mkdtemp(prefix="race_winner_")
        t = os.path.join(stage, "t")
        spark.range(3).withColumnRenamed("id", "v").coalesce(1).write.parquet(t)
        os.rename(t, base)
        shutil.rmtree(stage, ignore_errors=True)

    def loser_build():
        # Simulate the other process winning between our existence
        # check and our publish: it lands a complete table at `base`.
        winner_publish()
        return spark.range(9).withColumnRenamed("id", "v")

    try:
        out = shared_materialized(spark, SF, tag, ("region",), loser_build)
        # first-writer-wins: the loser must silently read the winner's
        # 3-row table, not raise and not clobber it with its 9 rows.
        assert out.count() == 3
        assert os.path.exists(os.path.join(base, "_SUCCESS"))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_crash_garbage_base_is_replaced(spark):
    tag = f"t_{uuid.uuid4().hex[:8]}"
    base = _base(tag)
    os.makedirs(base, exist_ok=True)  # _SUCCESS-less: crash garbage
    with open(os.path.join(base, "part-junk"), "w") as f:
        f.write("not parquet")
    try:
        out = shared_materialized(
            spark, SF, tag, ("region",),
            lambda: spark.range(4).withColumnRenamed("id", "v"),
        )
        assert out.count() == 4
        assert os.path.exists(os.path.join(base, "_SUCCESS"))
        assert not os.path.exists(os.path.join(base, "part-junk"))
    finally:
        shutil.rmtree(base, ignore_errors=True)
