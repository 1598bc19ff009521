"""Semantic validation for wave-6 operators beyond oracle parity:
planted near-dups for the banded SimHash search, PSI/mixture/PMI
invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.operators.dedup import (
    simhash_hamming_pairs,
    simhash_signatures,
)
from dieter___etl___monarchmoney_spark.registry import load
from tests.conftest import SF_SMOKE

QUERIES, _ = load()


def test_simhash_pairs_planted_neardup(spark):
    """A doc differing by one token out of many lands within hamming 3
    of the original, and the banded search must surface the pair."""
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(59)) + " other"
    far = " ".join(f"zzz{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sigs = {r["_id"]: r["simhash"] for r in simhash_signatures(df, "text", "doc_id").collect()}
    planted_ham = bin(sigs[1] ^ sigs[2]).count("1")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_hamming_pairs(df, "text", "doc_id").collect()
    }
    if planted_ham <= 3:  # overwhelmingly likely for a 1/60 token edit
        assert pairs[(1, 2)] == planted_ham
    # every reported pair is actually within the radius, ids ordered
    for (a, b), h in pairs.items():
        assert a < b and 0 <= h <= 3
        assert bin(sigs[a] ^ sigs[b]).count("1") == h


def test_simhash_pairs_exact_dup_and_cap(spark):
    """Exact duplicates are hamming-0 pairs; an over-cap degenerate
    bucket contributes no candidates."""
    rows = [(i, "common words shared by every doc") for i in range(1, 6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = simhash_hamming_pairs(df, "text", "doc_id").collect()
    assert len(got) == 10 and all(r["hamming"] == 0 for r in got)
    # cap smaller than the bucket population -> all candidates pruned
    assert simhash_hamming_pairs(df, "text", "doc_id", bucket_cap=3).count() == 0


def test_simhash_pairs_rejects_bad_radius(spark):
    """max_hamming values that don't split 32 bits into equal blocks
    (or that zero out the block width) must raise, not silently return
    wrong/empty candidates."""
    import pytest

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    for bad in (2, 4, 16, 31, 32, -1):
        with pytest.raises(ValueError):
            simhash_hamming_pairs(df, "text", "doc_id", max_hamming=bad)
    # the full valid set parses (plan construction only, no execution)
    for ok in (0, 1, 3, 7, 15):
        simhash_hamming_pairs(df, "text", "doc_id", max_hamming=ok)


def test_mixture_weights_invariants(spark):
    df = QUERIES["temperature_mixture_weights"](spark, SF_SMOKE).collect()
    assert abs(sum(r["weight"] for r in df) - 1.0) < 1e-6
    # temperature scaling up-weights small sources: epochs decrease as
    # source size grows
    by_size = sorted(df, key=lambda r: r["n_tokens"])
    epochs = [r["epochs"] for r in by_size]
    assert epochs == sorted(epochs, reverse=True)
    # one epoch of the mix spends exactly the corpus token budget
    total = sum(r["n_tokens"] for r in df)
    assert abs(sum(r["expected_tokens"] for r in df) - total) < 1.0


def test_psi_identical_split_is_zero(spark):
    """PSI of a distribution against itself is 0 per bin."""
    rows = [
        (i, "2024-01-%02d 12:00:00" % (1 + i % 30), float(i % 17))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts_s", "value"]).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        # identical value distribution in both halves of the window:
        # day = i % 30 cycles uniformly and value = i % 17 is independent
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = QUERIES["psi_value_drift"](spark, d).collect()
    assert len(out) >= 5
    assert all(abs(r["psi_term"]) < 0.02 for r in out)
    assert abs(sum(r["p_frac"] for r in out) - 1.0) < 1e-6
    assert abs(sum(r["q_frac"] for r in out) - 1.0) < 1e-6


def test_pmi_orders_collocations_above_chance(spark):
    """A bigram that always co-occurs outranks one diluted across many
    partners, and reported PMI matches the closed form."""
    docs = [(i, "alpha beta " + " ".join(f"w{i}_{j} filler" for j in range(3))) for i in range(10)]
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(docs, ["doc_id", "text"]).withColumn(
            "lang", F.lit("en")
        ).withColumn("source", F.lit("s")).withColumn(
            "n_chars", F.length("text")
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {(r["w1"], r["w2"]): r for r in QUERIES["pmi_collocations"](spark, d).collect()}
    r = out[("alpha", "beta")]
    # closed form: c_ab=10, c_a=c_b=10, nu=80, nb=70
    assert r["c_ab"] == 10
    assert abs(r["pmi"] - math.log((10 / 70) / ((10 / 80) * (10 / 80)))) < 1e-8
    # 'filler' pairs with 30 distinct partners -> lower PMI than the
    # dedicated collocation wherever both appear
    assert all(
        out[("alpha", "beta")]["pmi"] >= v["pmi"]
        for k, v in out.items()
        if "filler" in k
    )


def test_calendar_gap_fill_grid_complete(spark):
    """The grid is exactly days x types, gaps carry zeros, and non-gap
    cells match the filtered rollup."""
    out = QUERIES["calendar_gap_fill"](spark, SF_SMOKE).collect()
    days = {r["date"] for r in out}
    types = {r["event_type"] for r in out}
    assert len(out) == len(days) * len(types)
    gaps = [r for r in out if r["is_gap"]]
    assert gaps, "threshold should leave real holes in the smoke data"
    assert all(r["n_events"] == 0 and r["total_value"] == 0.0 for r in gaps)
    assert all(r["n_events"] > 0 for r in out if not r["is_gap"])
