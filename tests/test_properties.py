"""Property-based tests (hypothesis) for the normalize/merge layers —
the test style the reference lacks entirely (SURVEY.md §5 'no
property-based testing'). One Spark job per test: hypothesis generates
the data, a single createDataFrame round-trips it."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from dieter___etl___monarchmoney_spark.functions.money import clean_currency, money_sum

MONEY = st.decimals(
    min_value=Decimal("-99999.99"), max_value=Decimal("99999.99"), places=2
)


@settings(max_examples=5, deadline=None)
@given(st.lists(MONEY, min_size=1, max_size=50))
def test_currency_clean_roundtrips_formatting(spark, values):
    """Formatting a 2dp amount the messy way ($, commas, parens) and
    cleaning it back recovers the amount exactly."""

    def messy(d: Decimal) -> str:
        s = f"{abs(d):,.2f}"
        return f"(${s})" if d < 0 else f"${s}"

    df = spark.createDataFrame([(messy(v),) for v in values], ["raw"])
    got = [r["c"] for r in df.select(clean_currency("raw").alias("c")).collect()]
    for g, v in zip(got, values):
        assert g is not None and math.isclose(g, float(v), abs_tol=1e-9)


@settings(max_examples=5, deadline=None)
@given(st.lists(MONEY, min_size=1, max_size=100), st.integers(1, 31))
def test_money_sum_is_exact_and_partition_independent(spark, values, parts):
    """money_sum equals the exact decimal sum regardless of partitioning
    (the determinism claim the oracle gate rests on)."""
    df = spark.createDataFrame([(float(v),) for v in values], ["v"]).repartition(parts)
    got = df.agg(money_sum("v").alias("s")).collect()[0]["s"]
    assert got == float(sum(values))


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.dates(dt.date(2024, 1, 1), dt.date(2024, 3, 1))),
        min_size=1,
        max_size=40,
    ),
    st.dates(dt.date(2024, 1, 1), dt.date(2024, 3, 1)),
)
def test_replace_window_merge_partitions_cleanly(spark, rows, wm):
    """Merging a frame with its own window slice is identity (up to row
    multiplicity): kept ∪ fresh == original when fresh == window."""
    from dieter___etl___monarchmoney_spark.streaming.incremental import (
        replace_window_merge,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, d) for i, (i2, d) in enumerate(rows) for _ in [i2]], ["id", "d"])
    fresh = df.filter(F.col("d") >= F.lit(wm.isoformat()))
    merged = replace_window_merge(df, fresh, "d", wm)
    assert sorted((r["id"], r["d"]) for r in merged.collect()) == sorted(
        (r["id"], r["d"]) for r in df.collect()
    )

@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.integers(0, 2000),  # left ts (seconds)
        ),
        min_size=0,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 2000)),
        min_size=0,
        max_size=25,
    ),
    st.sampled_from([60, 300, 900]),
)
def test_banded_interval_join_matches_naive(spark, lrows, rrows, band):
    """The band-bucketed equi-join emits exactly the pairs the naive
    nested-loop definition does — including band-edge ties (gap == band
    is IN, gap == 0 is OUT) and keys present on only one side."""
    import datetime as _dt

    from dieter___etl___monarchmoney_spark.operators.rangejoin import (
        banded_interval_join,
    )

    epoch = _dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, k, epoch + _dt.timedelta(seconds=s)) for i, (k, s) in enumerate(lrows)],
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(i, k, epoch + _dt.timedelta(seconds=s)) for i, (k, s) in enumerate(rrows)],
        "rid long, k long, rts timestamp",
    )
    got = {
        (r["lid"], r["rid"], r["gap_micros"])
        for r in banded_interval_join(
            left, right, key="k", left_ts="lts", right_ts="rts", band_seconds=band
        ).collect()
    }
    want = {
        (li, ri, (rs - ls) * 1_000_000)
        for li, (lk, ls) in enumerate(lrows)
        for ri, (rk, rs) in enumerate(rrows)
        if lk == rk and 0 < (rs - ls) * 1_000_000 <= band * 1_000_000
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),  # user
            st.sampled_from(["signup", "view", "click", "purchase", "error"]),
            st.integers(0, 120),  # ts seconds
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_fold_matches_sequential_scan(spark, rows):
    """The HOF fold over time-sorted events reaches exactly the stages a
    straight per-user sequential scan reaches — including duplicate
    timestamps (strict > means an equal-ts next-stage event does NOT
    advance) and out-of-order arrival (the fold sorts first)."""
    import datetime as _dt
    import tempfile

    from pyspark.sql import functions as F

    from dieter___etl___monarchmoney_spark.queries.analytics_ops import (
        q_conversion_funnel,
    )

    epoch = _dt.datetime(2024, 1, 1)

    def naive():
        order = ["signup", "view", "click", "purchase"]
        reached = [0, 0, 0, 0]
        for u in {r[0] for r in rows}:
            evs = sorted((sec, typ) for (uu, typ, sec) in rows if uu == u)
            stage_ts = [None, None, None, None]
            for sec, typ in evs:
                if typ not in order:
                    continue
                i = order.index(typ)
                if stage_ts[i] is None and (
                    i == 0 or (stage_ts[i - 1] is not None and sec > stage_ts[i - 1])
                ):
                    stage_ts[i] = sec
            for i in range(4):
                if stage_ts[i] is not None:
                    reached[i] += 1
        return reached

    events = spark.createDataFrame(
        [
            (i, u, t, epoch + _dt.timedelta(seconds=s), 1.0, "{}")
            for i, (u, t, s) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        # q_conversion_funnel reads {sf_dir}/events.parquet — give it one
        events.select(
            "event_id",
            F.unix_micros("ts").alias("us"),
            "user_id",
            "event_type",
            "value",
            "props",
        ).withColumn("ts", F.expr("us * CAST(1000 AS BIGINT)")).drop("us").write.parquet(
            f"{d}/events.parquet"
        )
        row = q_conversion_funnel(spark, d).collect()[0]
    got = [row["n_signup"], row["n_view"], row["n_click"], row["n_purchase"]]
    assert got == naive()


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-1.0, 1.0, allow_nan=False, width=32), min_size=8, max_size=8
        ),
        min_size=12,
        max_size=40,
    ),
    st.integers(2, 5),
    st.integers(2, 8),
)
def test_two_phase_topk_is_lossless(spark, vecs, k, n_salt):
    """The salted pre-rank phase of the batch k-NN join keeps every
    global top-k candidate for ANY k and ANY salt count — per-group
    top-k is a superset of the global top-k."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dieter___etl___monarchmoney_spark.operators.similarity import dot

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    vectors = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = vectors.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = vectors.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        dot(F.col("embedding"), F.col("qv")).alias("s"),
    )
    w_naive = Window.partitionBy("query_id").orderBy(F.col("s").desc(), "vec_id")
    naive = {
        (r["query_id"], r["vec_id"])
        for r in scored.withColumn("rn", F.row_number().over(w_naive))
        .filter(F.col("rn") <= k)
        .collect()
    }
    salted = scored.withColumn("_salt", F.pmod(F.hash("vec_id"), F.lit(n_salt)))
    w1 = Window.partitionBy("query_id", "_salt").orderBy(F.col("s").desc(), "vec_id")
    w2 = Window.partitionBy("query_id").orderBy(F.col("s").desc(), "vec_id")
    two_phase = {
        (r["query_id"], r["vec_id"])
        for r in salted.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= k)
        .collect()
    }
    assert two_phase == naive


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),                      # user
            st.integers(0, 2000),                   # seconds offset
            st.sampled_from(["purchase", "view"]),  # type
        ),
        min_size=2,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.integers(1, 10),
)
def test_interval_join_batch_semantics(spark, events, minutes):
    """The batch form of the interval join (the streaming oracle)
    matches a per-row reference computation for ANY event layout and
    window width."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=sec), u, typ)
        for i, (u, sec, typ) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    p = df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = df.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    got = {
        (r["purchase_id"], r["view_id"])
        for r in p.join(
            v,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {minutes} MINUTES"))
            & (F.col("v_ts") <= F.col("p_ts")),
            "inner",
        ).collect()
    }
    want = {
        (pi, vi)
        for pi, (pu, psec, pt) in enumerate(events)
        for vi, (vu, vsec, vt) in enumerate(events)
        if pt == "purchase"
        and vt == "view"
        and pu == vu
        and psec - minutes * 60 <= vsec <= psec
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 4),            # user_id
            st.integers(0, 5000),         # minutes offset
            st.sampled_from(["signup", "purchase", "view"]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),  # no (user, ts) ties: match data
    )
)
def test_asof_union_scan_matches_bisect_replay(spark, tmp_path_factory, rows):
    """The union+window as-of rewrite must agree with a brute-force
    per-user replay (latest signup at-or-before each purchase) on
    arbitrary timelines — including users with no signups, purchases
    before any signup, and interleaved orderings."""
    import bisect

    from dieter___etl___monarchmoney_spark.registry import load

    QUERIES, _ = load()
    base = dt.datetime(2024, 3, 1)
    data = [
        (i, base + dt.timedelta(minutes=m), u, et, float(i), "{}")
        for i, (u, m, et) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path_factory.mktemp("asof_prop"))
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")

    signups: dict = {}
    for i, (u, m, et) in enumerate(rows):
        if et == "signup":
            signups.setdefault(u, []).append((m, float(i)))
    for v in signups.values():
        v.sort()

    got = QUERIES["asof_last_signup"](spark, out).collect()
    purchases = [(i, u, m) for i, (u, m, et) in enumerate(rows) if et == "purchase"]
    assert len(got) == len(purchases)
    by_id = {int(r.event_id): r for r in got}
    for i, u, m in purchases:
        cands = signups.get(u, [])
        j = bisect.bisect_right(cands, (m, float("inf")))
        r = by_id[i]
        if j == 0:
            assert r.signup_us is None and r.signup_value is None
        else:
            want_m, want_v = cands[j - 1]
            want_us = int((base + dt.timedelta(minutes=want_m)).timestamp() * 1e6)
            assert r.signup_us == want_us
            assert r.signup_value == want_v


@settings(max_examples=5, deadline=None)
@given(
    st.lists(MONEY, min_size=1, max_size=80),
    st.integers(2, 24),
)
def test_distributed_prefix_sum_signed_decimal_property(spark, values, ranges):
    """The two-phase distributed prefix sum equals the sequential
    running sum for ARBITRARY signed 2dp decimal streams at arbitrary
    range counts — the input class whose partition totals a
    max-of-prefix shortcut silently corrupts (r5 advice). Decimal
    amounts make the check exact: no float tolerance hides an
    off-by-a-partition offset."""
    from decimal import Decimal as D

    from dieter___etl___monarchmoney_spark.operators.prefix import (
        distributed_prefix_sum,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "k long, v decimal(18,2)"
    )
    got = {
        r.k: r.c
        for r in distributed_prefix_sum(
            df, ["k"], "v", "c", num_ranges=ranges
        ).collect()
    }
    running, want = D(0), {}
    for i, v in enumerate(values):
        running += v
        want[i] = running
    assert got == want
