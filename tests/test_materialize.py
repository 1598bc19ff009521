"""shared_materialized safety properties: concurrent-publish race,
fingerprint failure on missing sources, crash-garbage tolerance.

The publish protocol is versioned-dirs + an atomic ``CURRENT`` pointer
(nothing is ever deleted), so the race tests assert the two properties
that protocol guarantees: a reader pinned to a published version keeps
working no matter what racers do, and a cold builder that loses the
pointer race still ends with a complete, readable table.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest

from dieter___etl___monarchmoney_spark.sources.materialize import (
    cache_path,
    current_table_dir,
    shared_materialized,
    source_fingerprint,
)

SF = "/root/testdata/sf0.001"


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
        shutil.rmtree(cache_path(SF, tag, ("region",)), ignore_errors=True)


def test_publish_race_never_breaks_published_reader(spark):
    """A racer that publishes while another cold build is in flight:
    the already-returned reader must keep working (its version dir is
    immutable and never deleted), and the late publisher's own result
    must be a complete readable table."""
    tag = f"t_{uuid.uuid4().hex[:8]}"
    root = cache_path(SF, tag, ("region",))
    winner_frames = []

    def late_build():
        # Simulate the other process winning while our build runs: a
        # full publish (version dir + pointer swap) lands mid-build.
        winner_frames.append(
            shared_materialized(
                spark, SF, tag, ("region",),
                lambda: spark.range(3).withColumnRenamed("id", "v"),
            )
        )
        return spark.range(9).withColumnRenamed("id", "v")

    try:
        out = shared_materialized(spark, SF, tag, ("region",), late_build)
        # the winner's pinned reader still sees its complete 3-row table
        assert winner_frames[0].count() == 3
        # the late publisher reads a complete table (its own 9 rows —
        # pointer is last-writer-wins over identical-fingerprint builds)
        assert out.count() == 9
        # and a fresh resolve returns a readable published version
        vdir = current_table_dir(root)
        assert vdir is not None
        assert spark.read.parquet(vdir).count() == 9
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_crash_garbage_is_tolerated_not_trusted(spark):
    """Leftovers from a crashed builder (an unreferenced version dir,
    stray files under root) must neither satisfy the cache nor break
    the next build — and are never confused with published data."""
    tag = f"t_{uuid.uuid4().hex[:8]}"
    root = cache_path(SF, tag, ("region",))
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "part-junk"), "w") as f:
        f.write("not parquet")  # crashed pre-pointer garbage
    os.makedirs(os.path.join(root, "v_deadbeef"), exist_ok=True)
    try:
        assert current_table_dir(root) is None  # garbage is not a publish
        out = shared_materialized(
            spark, SF, tag, ("region",),
            lambda: spark.range(4).withColumnRenamed("id", "v"),
        )
        assert out.count() == 4
        vdir = current_table_dir(root)
        assert vdir is not None and os.path.basename(vdir) != "v_deadbeef"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_failed_build_leaks_no_staging(spark, tmp_path):
    """A build() that raises must not orphan a staging dir in tmp and
    must leave the cache cold (next call rebuilds)."""
    import tempfile as _tf

    tag = f"t_{uuid.uuid4().hex[:8]}"
    root = cache_path(SF, tag, ("region",))
    prefix = os.path.basename(root) + "_stage_"

    def bad_build():
        raise RuntimeError("boom")

    try:
        with pytest.raises(RuntimeError, match="boom"):
            shared_materialized(spark, SF, tag, ("region",), bad_build)
        leaks = [d for d in os.listdir(_tf.gettempdir()) if d.startswith(prefix)]
        assert leaks == []
        assert current_table_dir(root) is None
        out = shared_materialized(
            spark, SF, tag, ("region",),
            lambda: spark.range(2).withColumnRenamed("id", "v"),
        )
        assert out.count() == 2
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_stale_versions_pruned_after_publish(spark):
    """A successful pointer swap sweeps version dirs that are not
    CURRENT and older than the grace period (crash/race leftovers),
    while keeping young ones and the published version itself."""
    import time

    from dieter___etl___monarchmoney_spark.sources import materialize as m

    tag = f"t_{uuid.uuid4().hex[:8]}"
    root = cache_path(SF, tag, ("region",))
    os.makedirs(root, exist_ok=True)
    old = os.path.join(root, "v_stale_leftover")
    young = os.path.join(root, "v_young_leftover")
    os.makedirs(old)
    os.makedirs(young)
    past = time.time() - m._prune_grace_sec() - 60
    os.utime(old, (past, past))
    try:
        out = shared_materialized(
            spark, SF, tag, ("region",),
            lambda: spark.range(3).withColumnRenamed("id", "v"),
        )
        assert out.count() == 3
        assert not os.path.exists(old), "stale leftover must be pruned"
        assert os.path.exists(young), "young dirs stay (reader grace)"
        assert current_table_dir(root) is not None
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_previous_version_never_pruned(spark, monkeypatch):
    """ADVICE r8: the immediately-previous version survives pruning at
    ANY age — a reader pinned across one publish can never lose its
    dir, no matter how long its session runs; only a SECOND publish
    makes the dir eligible (and then only past the grace). Also pins
    the env-var grace override."""
    import time

    from dieter___etl___monarchmoney_spark.sources import materialize as m

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_GRACE_SEC", "123")
    assert m._prune_grace_sec() == 123
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_GRACE_SEC", "bogus")
    assert m._prune_grace_sec() == 24 * 3600
    # ADVICE r9: a negative value would put the cutoff in the future
    # and prune every non-newest dir immediately — clamp to 0
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_GRACE_SEC", "-5")
    assert m._prune_grace_sec() == 0
    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE_GRACE_SEC")

    tag = f"t_{uuid.uuid4().hex[:8]}"
    root = cache_path(SF, tag, ("region",))
    os.makedirs(root, exist_ok=True)
    # the sole non-CURRENT dir: ancient, but it is the newest (and
    # only) superseded version — must be spared unconditionally
    prev = os.path.join(root, "v_previous_pin")
    os.makedirs(prev)
    ancient = time.time() - 10 * m._prune_grace_sec()
    os.utime(prev, (ancient, ancient))
    try:
        out = shared_materialized(
            spark, SF, tag, ("region",),
            lambda: spark.range(4).withColumnRenamed("id", "v"),
        )
        assert out.count() == 4
        assert os.path.exists(prev), "previous version must survive pruning"
        # a second aged leftover makes the OLDER one prunable while the
        # newest superseded dir still survives
        older = os.path.join(root, "v_older_leftover")
        os.makedirs(older)
        os.utime(older, (ancient - 60, ancient - 60))
        cur = current_table_dir(root)
        m._prune_stale_versions(root, keep=os.path.basename(cur))
        assert not os.path.exists(older)
        assert os.path.exists(prev)
        assert os.path.exists(cur)
    finally:
        shutil.rmtree(root, ignore_errors=True)
