"""Unit tests for the corpus-curation composition queries
(queries/curation.py): split determinism, curation invariants,
histogram consistency. Oracle parity is covered by the registry gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.queries.curation import (
    q_corpus_curation,
    q_token_length_histogram,
    q_train_val_test_split,
)
from tests.conftest import SF_SMOKE


def test_split_deterministic_and_total(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total = docs.count()
    a = q_train_val_test_split(spark, SF_SMOKE)
    assert a.count() == total
    # same assignment on re-run (no RNG, no ordering dependence)
    b = q_train_val_test_split(spark, SF_SMOKE)
    assert a.exceptAll(b).count() == 0
    rows = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # 90/5/5 within loose tolerance on a few hundred docs
    assert rows["train"] / total > 0.8
    assert 0 < rows.get("val", 0) < 0.15 * total
    assert 0 < rows.get("test", 0) < 0.15 * total


def test_split_buckets_in_range(spark):
    out = q_train_val_test_split(spark, SF_SMOKE)
    bad = out.filter((F.col("bucket") < 0) | (F.col("bucket") >= 100)).count()
    assert bad == 0
    # split labels must agree with the bucket ranges
    wrong = out.filter(
        ((F.col("bucket") < 90) & (F.col("split") != "train"))
        | (F.col("bucket").between(90, 94) & (F.col("split") != "val"))
        | ((F.col("bucket") >= 95) & (F.col("split") != "test"))
    ).count()
    assert wrong == 0


def test_corpus_curation_invariants(spark):
    from dieter___etl___monarchmoney_spark.functions.text import fingerprint_md5
    from dieter___etl___monarchmoney_spark.operators.dedup import minhash_lsh_dedup_pairs

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = q_corpus_curation(spark, SF_SMOKE).persist()
    # all survivors pass the quality bar
    assert out.filter(F.col("quality") < 0.5).count() == 0
    # no two survivors share a normalized-text fingerprint
    fps = (
        out.join(docs, "doc_id")
        .select(fingerprint_md5("text").alias("fp"))
        .groupBy("fp")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert fps == 0
    # no survivor is the higher id of a MinHash candidate pair
    losers = minhash_lsh_dedup_pairs(docs, "text", "doc_id").select(
        F.col("doc_b").alias("doc_id")
    )
    assert out.join(losers, "doc_id").count() == 0


def test_token_length_histogram_totals(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    hist = q_token_length_histogram(spark, SF_SMOKE).collect()
    assert sum(r["n_docs"] for r in hist) == docs.count()
    assert all(r["bucket_lo"] % 16 == 0 for r in hist)
    assert all(abs(r["avg_tokens"] - r["total_tokens"] / r["n_docs"]) < 1e-9 for r in hist)


def test_boilerplate_audit_invariants(spark):
    from dieter___etl___monarchmoney_spark.queries.curation import (
        q_boilerplate_segment_audit,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = q_boilerplate_segment_audit(spark, SF_SMOKE)
    rows = out.collect()
    # every document is audited exactly once
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r["n_boilerplate"] <= r["n_segments"]
        assert r["tokens_kept"] == (r["n_segments"] - r["n_boilerplate"]) * 3
    # the synthetic corpus repeats short word patterns: some boilerplate
    # must actually be detected, else the threshold is degenerate
    assert any(r["n_boilerplate"] > 0 for r in rows)


def test_pii_redaction_removes_all_digit_runs(spark):
    from dieter___etl___monarchmoney_spark.queries.curation import q_pii_redaction_audit

    out = q_pii_redaction_audit(spark, SF_SMOKE)
    leaked = out.filter(F.col("name_redacted").rlike("[0-9]{4,}")).count()
    assert leaked == 0
    # customer names carry zero-padded keys: every row redacts something
    assert out.filter(F.col("n_ids_redacted") == 0).count() == 0
    assert out.filter(F.col("n_chars_redacted") <= 0).count() == 0


def test_global_shuffle_is_a_permutation(spark):
    from dieter___etl___monarchmoney_spark.queries.curation import (
        q_global_shuffle_assignment,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = q_global_shuffle_assignment(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) == docs.count()
    # shard positions are contiguous 1..n within each shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard
    # deterministic: a second run assigns identically
    again = q_global_shuffle_assignment(spark, SF_SMOKE)
    assert out.exceptAll(again).count() == 0


def test_source_mixture_downsamples_toward_budget(spark):
    from dieter___etl___monarchmoney_spark.functions.text import token_count
    from dieter___etl___monarchmoney_spark.queries.curation import (
        q_source_mixture_sample,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    out = q_source_mixture_sample(spark, SF_ORACLE)
    # kept docs are a subset; keep_frac is a valid probability
    assert out.count() <= docs.count()
    assert out.filter((F.col("keep_frac") <= 0) | (F.col("keep_frac") > 1)).count() == 0
    # sources kept whole (keep_frac == 1) retain every document
    whole = out.filter(F.col("keep_frac") == 1.0).groupBy("source").count()
    totals = docs.groupBy("source").count().withColumnRenamed("count", "n_total")
    mismatched = (
        whole.join(totals, "source").filter(F.col("count") != F.col("n_total")).count()
    )
    assert mismatched == 0
    # downsampled sources land near their token budget in expectation
    kept_tokens = (
        out.filter(F.col("keep_frac") < 1.0)
        .join(docs.select("doc_id", token_count("text").alias("n_tok")), "doc_id")
        .groupBy("source")
        .agg(F.sum("n_tok").alias("kept"))
    )
    for r in kept_tokens.collect():
        assert 400 <= r["kept"] <= 2400, r  # 1200 +- generous hash noise
    # deterministic across runs
    again = q_source_mixture_sample(spark, SF_ORACLE)
    assert out.exceptAll(again).count() == 0


def test_quality_deciles_balanced_per_lang(spark):
    from dieter___etl___monarchmoney_spark.queries.curation import (
        q_quality_decile_assignment,
    )
    from tests.conftest import SF_ORACLE

    out = q_quality_decile_assignment(spark, SF_ORACLE)
    sizes = out.groupBy("lang", "q_decile").count().collect()
    per_lang: dict[str, list] = {}
    for r in sizes:
        assert 1 <= r["q_decile"] <= 10
        per_lang.setdefault(r["lang"], []).append(r["count"])
    for lang, counts in per_lang.items():
        assert len(counts) == 10, lang
        assert max(counts) - min(counts) <= 1, lang  # NTILE balance
    # deciles order by quality: every doc in decile d has quality <= any in d+1
    agg = (
        out.groupBy("lang", "q_decile")
        .agg(F.min("quality").alias("lo"), F.max("quality").alias("hi"))
        .orderBy("lang", "q_decile")
        .collect()
    )
    prev = {}
    for r in agg:
        if r["lang"] in prev:
            assert r["lo"] >= prev[r["lang"]] - 1e-12
        prev[r["lang"]] = r["hi"]
