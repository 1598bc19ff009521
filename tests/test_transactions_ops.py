"""Unit tests for the parametrized transactions-query surface
(SURVEY.md §2.2/§2.5/§2.6): point lookup, coalesce, pagination paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.operators.transactions import (
    coalesce_account_id,
    paginate_row_number,
    point_lookup,
    transactions_query,
)
from dieter___etl___monarchmoney_spark.sources.star_model import transactions
from tests.conftest import SF_SMOKE


def test_point_lookup(spark):
    txns = transactions(spark, SF_SMOKE)
    one = point_lookup(txns, "txn_id", "201-4-101-9").collect()
    assert len(one) == 1 and one[0]["order_id"] == 201


def test_coalesce_account_id(spark):
    df = spark.createDataFrame(
        [(None, "a2", "a3"), ("a1", None, None), (None, None, None)],
        ["accountId", "acc_id", "fallback"],
    )
    out = coalesce_account_id(df, ["accountId", "acc_id", "fallback"], "resolved")
    assert [r["resolved"] for r in out.collect()] == ["a2", "a1", None]


def test_pagination_paths_agree(spark):
    """offset/limit (TakeOrderedAndProject) and row_number produce the
    same page — W5's two physical strategies, one semantics."""
    txns = transactions(spark, SF_SMOKE).select("txn_id", "txn_date", "amount")
    a = transactions_query(txns, order_by=("txn_date", "txn_id"), offset=37, limit=20)
    b = paginate_row_number(txns, ("txn_date", "txn_id"), 37, 20)
    assert [r["txn_id"] for r in a.collect()] == [r["txn_id"] for r in b.collect()]


def test_huge_offset_uses_window_path(spark):
    """offset+limit past _TAKE_ORDERED_MAX_ROWS must not plan a
    TakeOrderedAndProject: guava's TopKSelector eagerly allocates a
    2·(offset+limit) buffer per task, so a deep page-through (or a
    fat-fingered offset) would OOM executors on ANY non-empty input.
    The fallback row_number page returns the same rows as the top-k
    plan would — and past the end of the data, an empty page."""
    txns = transactions(spark, SF_SMOKE).select("txn_id", "txn_date", "amount")
    # past-the-end: empty, and completes without an executor OOM
    big = transactions_query(
        txns, order_by=("txn_date", "txn_id"), offset=10**9, limit=100
    )
    assert "TakeOrderedAndProject" not in big._jdf.queryExecution().executedPlan().toString()
    assert big.count() == 0
    # offset-only (no limit) at huge offset: also empty, no OOM
    assert (
        transactions_query(
            txns, order_by=("txn_date", "txn_id"), offset=10**9
        ).count()
        == 0
    )
    # same page either side of the threshold boundary semantics
    lo = transactions_query(txns, order_by=("txn_date", "txn_id"), offset=7, limit=5)
    hi = paginate_row_number(txns, ("txn_date", "txn_id"), 7, 5)
    assert [r["txn_id"] for r in lo.collect()] == [r["txn_id"] for r in hi.collect()]


def test_negative_pagination_raises_value_error(spark):
    """Negative offset/limit fail fast with a client-side ValueError,
    not a Spark AnalysisException from inside the plan."""
    import pytest

    txns = transactions(spark, SF_SMOKE).select("txn_id", "txn_date")
    with pytest.raises(ValueError, match="offset must be >= 0"):
        transactions_query(txns, order_by=("txn_date", "txn_id"), offset=-1)
    with pytest.raises(ValueError, match="limit must be >= 0"):
        transactions_query(txns, order_by=("txn_date", "txn_id"), limit=-1)


def test_search_predicate(spark):
    df = spark.createDataFrame(
        [("x", "apple pie", None), ("y", "beef", "apple farm"), ("z", "carrot", None)],
        ["id", "plaidName", "notes"],
    )
    got = transactions_query(df, search="apple", search_columns=("plaidName", "notes"))
    assert sorted(r["id"] for r in got.collect()) == ["x", "y"]


def test_asof_join_semantics(spark):
    """Backward as-of: inclusive same-instant match, latest-before wins,
    unmatched left keeps nulls, keys never cross."""
    import datetime as dt

    from dieter___etl___monarchmoney_spark.operators.asof import asof_join

    t = dt.datetime
    left = spark.createDataFrame(
        [(1, "u1", t(2024, 1, 1, 12)), (2, "u1", t(2024, 1, 1, 9)),
         (3, "u2", t(2024, 1, 1, 12))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", t(2024, 1, 1, 10), 100), ("u1", t(2024, 1, 1, 12), 200),
         ("u3", t(2024, 1, 1, 1), 999)],
        "user_id string, ts timestamp, rv long",
    )
    out = {r["event_id"]: r for r in asof_join(
        left, right, keys=["user_id"], ts_col="ts", tiebreak=["rv"]
    ).collect()}
    # event 1 at 12:00 matches the 12:00 right row (inclusive <=)
    assert out[1]["asof_rv"] == 200
    # event 2 at 9:00 precedes every u1 right row -> nulls
    assert out[2]["asof_rv"] is None and out[2]["asof_ts"] is None
    # u2 has no right rows at all; u3's rows must not leak across keys
    assert out[3]["asof_rv"] is None
