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


def test_prefix_filter_jaccard_is_lossless(spark):
    """Prefix filtering must find EXACTLY the pairs the full uncapped
    inverted-index join finds — same threshold, same n — proving the
    |d|−⌈t·|d|⌉+1 rarest-shingle index drops no qualifying pair."""
    from dieter___etl___monarchmoney_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    full = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.5, doc_freq_cap=None
        ).collect()
    }
    prefix = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.5
        ).collect()
    }
    assert prefix == full and len(prefix) > 0


def test_prefix_filter_indexes_fewer_postings(spark):
    """The point of the prefix index: far fewer exploded postings than
    the full inverted index, without losing a pair (previous test)."""
    from dieter___etl___monarchmoney_spark.functions.text import tokens
    from dieter___etl___monarchmoney_spark.operators.dedup import shingles_of

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    toks = docs.select(
        "doc_id", F.filter(tokens("text"), lambda t: t != "").alias("toks")
    )
    doc_sh = toks.select(
        "doc_id", F.array_distinct(shingles_of(F.col("toks"), 3)).alias("sh_arr")
    ).filter(F.size("sh_arr") > 0)
    n_total = doc_sh.select(F.sum(F.size("sh_arr"))).collect()[0][0]
    # prefix length with t=0.5 is ~half the shingles per doc
    prefix_len = F.size("sh_arr") - F.ceil(F.lit(0.5) * F.size("sh_arr")) + 1
    n_prefix = doc_sh.select(F.sum(prefix_len)).collect()[0][0]
    assert n_prefix < 0.6 * n_total


def test_bigram_lm_scores_fluency(spark):
    """A doc made of corpus-frequent bigrams must outscore a doc of
    corpus-unique bigrams (its transitions were seen; theirs weren't)."""
    from dieter___etl___monarchmoney_spark.queries.corpus_ops import (
        q_bigram_lm_quality,
    )
    import os
    import tempfile

    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((100, "zq xv jk wp mn bz"))
    tmp = os.path.join(tempfile.gettempdir(), "bigram_lm_unit")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "documents.parquet"))
    out = {r["doc_id"]: r["avg_logp"] for r in q_bigram_lm_quality(spark, tmp).collect()}
    assert out[0] > out[100]
    assert all(out[i] == out[0] for i in range(20))  # identical docs, identical score


def test_table_checksum_localizes_a_mutation(spark, tmp_path):
    """Flipping one field in one row changes the checksum in EXACTLY
    that row's bucket — the migration-validation property."""
    from dieter___etl___monarchmoney_spark.queries.scale_ops import q_table_checksum

    src = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    base = {r["bucket"]: r["checksum"] for r in q_table_checksum(spark, SF_ORACLE).collect()}

    mutated_dir = str(tmp_path / "mutated")
    mutated = src.withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") == 7, F.lit("TAMPERED")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    mutated.write.parquet(mutated_dir + "/orders.parquet")
    got = {
        r["bucket"]: r["checksum"]
        for r in q_table_checksum(spark, mutated_dir).collect()
    }
    diff = {b for b in base if base[b] != got.get(b)}
    assert diff == {7 % 16}


def test_streaming_left_join_emits_unmatched_nulls(spark):
    """The left-outer stream-stream join emits every purchase exactly
    once — matched rows with view ids, tail/unmatched rows null-padded
    after the flush marker advances the watermark."""
    from dieter___etl___monarchmoney_spark.queries.streaming_queries import (
        q_streaming_left_join,
    )

    out = q_streaming_left_join(spark, SF_ORACLE)
    rows = out.collect()
    n_purchases = (
        spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    matched = [r for r in rows if r["view_id"] is not None]
    unmatched = [r for r in rows if r["view_id"] is None]
    # every purchase appears; unmatched ones exactly once with nulls
    assert len({r["purchase_id"] for r in unmatched}) == len(unmatched)
    assert len(matched) > 0 and len(unmatched) > 0
    assert len({r["purchase_id"] for r in rows}) == n_purchases


def test_bounded_levenshtein_keepset_equals_unbounded(spark):
    """The 3-arg banded levenshtein (round 10) must keep EXACTLY the
    pairs the unbounded form kept and emit identical distances for
    them: dist <= k  <=>  bounded(k) >= 0, with bounded(k) == dist on
    every kept row. Pins the swap in fuzzy_name_dedup /
    fuzzy_entity_resolution against any future semantic drift in the
    threshold form (the -1 sentinel is the only difference)."""
    from pyspark.sql import functions as F

    pairs = [
        ("same", "same"),
        ("kitten", "sitten"),        # 1
        ("kitten", "sittin"),        # 2
        ("kitten", "sitting"),       # 3
        ("abc", ""),                 # 3 (empty edge)
        ("forest green", "forest grees"),  # 1
        ("a" * 40, "a" * 38 + "bb"),       # 2, long strings
        ("totally", "different"),    # far
    ]
    df = spark.createDataFrame(pairs, ["l", "r"])
    for k in (2, 4):
        rows = df.select(
            F.levenshtein("l", "r").alias("d"),
            F.levenshtein("l", "r", k).alias("dk"),
        ).collect()
        for row in rows:
            if row.d <= k:
                assert row.dk == row.d, (k, row)
            else:
                assert row.dk == -1, (k, row)


def test_fuzzy_er_join_is_blocked_not_nested_loop(spark):
    """The entity-resolution candidate join must plan as an EQUI join
    on the (brand, first-token) block key — a predicate reorder that
    drops the equi conjuncts would silently degrade to
    BroadcastNestedLoopJoin/CartesianProduct (all-pairs over the
    catalog: the exact n^2 the blocking exists to avoid)."""
    from dieter___etl___monarchmoney_spark import registry

    queries, _ = registry.load()
    df = queries["fuzzy_entity_resolution"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
