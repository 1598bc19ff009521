"""Second-wave corpus operators (queries/corpus_ops.py): batch k-NN
join, cross-doc duplicated n-gram fraction, semantic dedup clusters,
BM25 ranking — semantics on synthetic data plus plan-shape pins."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark import registry
from tests.conftest import SF_ORACLE

QUERIES, _ = registry.load()


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_knn_two_phase_equals_single_window(spark):
    """Phase-1 (query, salt) pre-ranking must be lossless: the two-phase
    top-3 equals the naive one-window top-3 on the oracle SF."""
    df = QUERIES["knn_batch_join"](spark, SF_ORACLE)
    got = {(r["query_id"], r["vec_id"], r["neighbor_rank"]) for r in df.collect()}

    from dieter___etl___monarchmoney_spark.operators.similarity import dot
    from dieter___etl___monarchmoney_spark.sources.parquet import load_table

    vectors = load_table(spark, "embeddings", SF_ORACLE)
    queries = vectors.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = vectors.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        (
            dot(F.col("embedding"), F.col("qv"))
            / (
                F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(dot(F.col("qv"), F.col("qv")))
            )
        ).alias("similarity"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("similarity").desc(), "vec_id")
    naive = (
        scored.withColumn("neighbor_rank", F.row_number().over(w))
        .filter(F.col("neighbor_rank") <= 3)
    )
    want = {(r["query_id"], r["vec_id"], r["neighbor_rank"]) for r in naive.collect()}
    assert got == want and len(got) == 8 * 3


def test_knn_no_single_partition_funnel(spark):
    plan = _plan(QUERIES["knn_batch_join"](spark, SF_ORACLE))
    assert "Exchange SinglePartition" not in plan
    # the query batch is the broadcast side of the scoring join
    assert "BroadcastNestedLoopJoin" in plan


def test_duplicated_ngram_fraction_planted(spark):
    """Two docs sharing an identical 6-token run + one unique doc."""
    from dieter___etl___monarchmoney_spark.queries.corpus_ops import (
        q_duplicated_ngram_fraction,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta unique tail one"),
            (2, "alpha beta gamma delta epsilon zeta other ending two"),
            (3, "completely different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    docs.createOrReplaceTempView("_dupfrac_docs")
    # drive the operator body directly on the tiny frame
    from dieter___etl___monarchmoney_spark.functions.text import tokens
    from dieter___etl___monarchmoney_spark.operators.dedup import shingles_of

    toks = docs.select(
        "doc_id", F.filter(tokens("text"), lambda t: t != "").alias("toks")
    )
    doc_sh = toks.select(
        "doc_id", F.array_distinct(shingles_of(F.col("toks"), 5)).alias("sh_arr")
    )
    sh = doc_sh.select("doc_id", F.explode("sh_arr").alias("shingle"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("doc_freq"))
    shared = (
        sh.join(freq.filter(F.col("doc_freq") >= 2), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    got = {r["doc_id"]: r["n_shared"] for r in shared.collect()}
    # docs 1 and 2 share exactly the 5-grams inside "alpha..zeta": 2 each
    assert got == {1: 2, 2: 2}


def test_semantic_clusters_match_pair_graph(spark):
    """Every pair found by the bucketed cosine join must land in one
    cluster, and cluster_id is the component minimum."""
    from dieter___etl___monarchmoney_spark.operators.similarity import (
        embedding_neardup_pairs,
    )
    from dieter___etl___monarchmoney_spark.sources.parquet import load_table

    assigned = {
        r["vec_id"]: r["cluster_id"]
        for r in QUERIES["semantic_dedup_clusters"](spark, SF_ORACLE).collect()
    }
    vectors = load_table(spark, "embeddings", SF_ORACLE)
    pairs = embedding_neardup_pairs(vectors, threshold=0.4).collect()
    assert len(pairs) > 0  # threshold calibrated to be non-vacuous
    for p in pairs:
        assert assigned[p["id_a"]] == assigned[p["id_b"]]
    for vid, cid in assigned.items():
        assert cid <= vid  # min-label: survivor id never exceeds member id


def test_bm25_ranks_rare_term_docs_first(spark):
    """'dup' appears in ~5% of docs; idf dominates, so every top-20 doc
    should contain it (tf of the rare term beats common-term tf)."""
    rows = QUERIES["bm25_doc_ranking"](spark, SF_ORACLE).collect()
    assert len(rows) == 20
    assert all(
        rows[i]["bm25"] >= rows[i + 1]["bm25"] for i in range(len(rows) - 1)
    )
    from dieter___etl___monarchmoney_spark.sources.parquet import load_table

    docs = load_table(spark, "documents", SF_ORACLE)
    with_dup = {
        r["doc_id"]
        for r in docs.filter(F.col("text").contains("dup")).select("doc_id").collect()
    }
    top5 = [r["doc_id"] for r in rows[:5]]
    assert all(d in with_dup for d in top5)


def test_dupfrac_no_pair_explosion(spark):
    """The dup-fraction plan is linear: no self-join of the posting
    lists, no cartesian/nested-loop anywhere."""
    plan = _plan(QUERIES["duplicated_ngram_fraction"](spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_bloom_filter_no_false_negatives(spark):
    """bloom_build/bloom_might_contain: every member hits; non-member
    false-positive rate stays near the design point (~1% at k=3,
    m=16384 for 1000 keys); the pre-filter can only shrink an exact
    join's input."""
    from dieter___etl___monarchmoney_spark.operators.dedup import (
        bloom_build,
        bloom_might_contain,
    )

    members = spark.range(0, 1000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("fp")
    )
    words = bloom_build(members, "fp")
    assert len(words) == (1 << 14) // 64

    probe = spark.range(0, 5000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("fp")
    )
    hit = probe.filter(bloom_might_contain(words, "fp"))
    # zero false negatives: all 1000 members pass the probe
    assert members.join(hit, "fp", "left_anti").count() == 0
    # false positives bounded: 4000 non-members, expect ~1% FP
    fps = hit.count() - 1000
    assert 0 <= fps < 200


def test_bloom_dedup_matches_plain_anti_join(spark):
    """The bloom-accelerated incremental dedup returns exactly the
    unaccelerated anti-join's rows on the oracle SF."""
    got = {
        (r["doc_id"], r["fp"])
        for r in QUERIES["bloom_incremental_dedup"](spark, SF_ORACLE).collect()
    }
    want = {
        (r["doc_id"], r["fp"])
        for r in QUERIES["incremental_dedup"](spark, SF_ORACLE).collect()
    }
    assert got == want and len(got) > 0
