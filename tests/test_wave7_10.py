"""Semantic validation for the round-4 waves beyond oracle parity:
planted signals for the changepoint/seasonal detectors, sketch-accuracy
bounds for KMV, the SCD2-vs-asof boundary case, and closed-form checks
for the recursive walk."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dieter___etl___monarchmoney_spark.registry import load
from tests.conftest import SF_ORACLE, SF_SMOKE

QUERIES, _ = load()


def test_kmv_estimate_accuracy(spark):
    """The KMV Jaccard estimate must land near the exact Jaccard it is
    printed next to — k=128 gives ~1/sqrt(k) ≈ 0.09 standard error, so
    |est − exact| ≤ 0.25 is a generous-but-meaningful bound for every
    pair, and the estimates must not be degenerate (not all 0/1)."""
    rows = QUERIES["kmv_set_similarity"](spark, SF_ORACLE).collect()
    assert rows, "no event-type pairs"
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert abs(r["est_jaccard"] - r["exact_jaccard"]) <= 0.25, r
        assert r["n_union"] >= r["n_inter"] >= 0


def test_cusum_finds_planted_changepoint(spark, tmp_path):
    """A series with a level shift at a known date must put that date
    (or its immediate neighbors) at the top of the CUSUM ranking."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(60):
        level = 10.0 if day < 30 else 50.0
        for _ in range(3):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "e", level, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    src = str(tmp_path / "planted")
    import os

    os.makedirs(src, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{src}/events.parquet")
    top = QUERIES["cusum_changepoint"](spark, src).first()
    # |S_t| peaks at the last pre-shift day for a mean-level shift
    assert abs((top["changepoint_date"] - dt.date(2024, 1, 30)).days) <= 1


def test_seasonal_dow_flags_planted_anomaly(spark, tmp_path):
    """With a flat weekly pattern plus ONE spiked day, the spiked day
    must rank first by |residual|."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(56):  # 8 full weeks
        n = 5 + (day % 7)  # weekly seasonality
        if day == 40:
            n += 50  # the anomaly
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "e", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    src = str(tmp_path / "planted_dow")
    import os

    os.makedirs(src, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{src}/events.parquet")
    top = QUERIES["seasonal_dow_decompose"](spark, src).first()
    assert top["d"] == dt.date(2024, 1, 1) + dt.timedelta(days=40)
    assert top["residual"] > 40  # the spike net of its weekday baseline


def test_band_filter_bounds_hold(spark):
    """Every kept document lies inside its source's [lo, hi] band, and
    the band drops roughly the outer 10% (kept fraction in [0.85, 1.0]
    for any distribution since cutoffs are inclusive ranks)."""
    from dieter___etl___monarchmoney_spark.sources.parquet import load_table

    out = {r["source"]: r for r in QUERIES["doc_length_band_filter"](spark, SF_ORACLE).collect()}
    totals = {
        r["source"]: r["n"]
        for r in load_table(spark, "documents", SF_ORACLE)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for src, r in out.items():
        assert r["lo_chars"] <= r["hi_chars"]
        frac = r["n_kept"] / totals[src]
        assert 0.80 <= frac <= 1.0, (src, frac)


def test_scd2_join_stricter_than_asof(spark):
    """The SCD2 temporal join must drop facts that precede the first
    dimension version — the exact case the as-of join (latest ≤ ts)
    also drops, but SCD2 additionally NEVER matches a later version;
    verify both properties row-by-row against a window recomputation."""
    from dieter___etl___monarchmoney_spark.sources.parquet import load_table

    got = QUERIES["scd2_temporal_join"](spark, SF_ORACLE)
    ev = load_table(spark, "events", SF_ORACLE)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su"), F.col("ts").alias("sts"), "value"
    )
    # recompute: latest signup <= purchase ts (asof) — SCD2 must equal
    # it exactly on matched rows (intervals partition time after v1)
    j = p.join(s, (F.col("user_id") == F.col("su")) & (F.col("sts") <= F.col("ts")))
    w = Window.partitionBy("event_id").orderBy(F.col("sts").desc())
    want = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", F.col("value").alias("profile_value"))
    )
    diff = got.select("event_id", "profile_value").exceptAll(want).count()
    diff2 = want.exceptAll(got.select("event_id", "profile_value")).count()
    assert diff == 0 and diff2 == 0
    # and no purchase before its user's first signup got a row
    firsts = s.groupBy("su").agg(F.min("sts").alias("first_s"))
    early = (
        p.join(firsts, p.user_id == firsts.su)
        .filter(F.col("ts") < F.col("first_s"))
        .count()
    )
    assert got.count() == p.join(s, (p.user_id == s.su), "left_semi").count() - early


def test_recursive_depth_closed_form(spark):
    """depth_to_root must equal floor(log2(user_id)) for user_id ≥ 1
    (the halving tree's closed form) and the ancestor count depth+1."""
    rows = QUERIES["recursive_referral_depth"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        u = r["user_id"]
        want = 0 if u <= 1 else int(math.floor(math.log2(u)))
        assert r["depth_to_root"] == want, (u, r["depth_to_root"], want)
        assert r["n_ancestors"] == r["depth_to_root"] + 1


def test_lateral_equals_window_form(spark):
    """The LATERAL top-1 must equal the max(struct) formulation — the
    two idioms users translate between must never drift."""
    from dieter___etl___monarchmoney_spark.sources.parquet import load_table

    got = QUERIES["lateral_best_line_per_order"](spark, SF_ORACLE)
    li = load_table(spark, "lineitem", SF_ORACLE)
    orders = load_table(spark, "orders", SF_ORACLE).filter(
        F.col("o_orderstatus") == "F"
    )
    best = (
        li.groupBy("l_orderkey")
        .agg(
            F.max(
                F.struct(
                    F.col("l_quantity"),
                    (-F.col("l_linenumber")).alias("neg_ln"),
                    F.col("l_linenumber"),
                )
            ).alias("m")
        )
        .select(
            "l_orderkey",
            F.col("m.l_linenumber").alias("l_linenumber"),
            F.col("m.l_quantity").alias("l_quantity"),
        )
    )
    want = (
        orders.join(best, orders.o_orderkey == best.l_orderkey)
        .select("o_orderkey", "o_orderpriority", "l_linenumber", "l_quantity")
        .orderBy("o_orderkey")
        .limit(500)
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_variant_matches_from_json(spark):
    """variant_get extraction must agree with the legacy from_json path
    on every row (the migration equivalence a user relies on)."""
    from dieter___etl___monarchmoney_spark.sources.parquet import load_table

    ev = load_table(spark, "events", SF_ORACLE)
    v = ev.select(
        "event_id",
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k_variant"),
        F.from_json("props", "k bigint")["k"].alias("k_json"),
    )
    assert v.filter(
        ~(
            (F.col("k_variant") == F.col("k_json"))
            | (F.col("k_variant").isNull() & F.col("k_json").isNull())
        )
    ).count() == 0


def test_conversion_lag_quantiles_ordered(spark):
    r = QUERIES["conversion_lag_quantiles"](spark, SF_ORACLE).first()
    assert r["n_converted"] > 0
    assert 0 <= r["p50_lag_us"] <= r["p90_lag_us"] <= r["p99_lag_us"]
