"""FinanceWarehouse facade tests: build a small warehouse, then drive
the reference-shaped API surface end to end (reads, filters, cashflow,
mutations)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.api import FinanceWarehouse


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("warehouse"))
    w = FinanceWarehouse(spark, root)
    txns = spark.createDataFrame(
        [
            ("t1", dt.date(2024, 1, 5), 120.0, "a1", "c1", "Kroger", "groceries", ["g1"], None, False),
            ("t2", dt.date(2024, 1, 20), -55.5, "a1", "c2", "Shell", None, [], None, True),
            ("t3", dt.date(2024, 2, 2), -900.0, "a2", "c2", "Rent Co", "feb rent", ["g1", "g2"], None, False),
            ("s1", dt.date(2024, 2, 2), -400.0, "a2", "c2", "Rent Co", None, [], "t3", False),
        ],
        ["id", "date", "amount", "account_id", "category_id", "merchant_name",
         "notes", "tag_ids", "parent_id", "isRecurring"],
    ).withColumn("plaidName", F.col("merchant_name"))
    w.save("transactions", txns)
    w.save(
        "accounts",
        spark.createDataFrame(
            [("a1", "Checking", "depository", "checking", 1000.0, "Chase"),
             ("a2", "Savings", "depository", "savings", 5000.0, "Ally")],
            ["id", "displayName", "type", "subtype", "currentBalance", "institutionName"],
        ),
    )
    w.save("categories", spark.createDataFrame(
        [("c1", "Food", "g-exp"), ("c2", "Housing", "g-exp")], ["id", "name", "group_id"]))
    w.save("category_groups", spark.createDataFrame(
        [("g-exp", "Expenses", "expense")], ["id", "name", "type"]))
    w.save("tags", spark.createDataFrame(
        [("g1", "joint", "blue", 0), ("g2", "big", "red", 0)],
        ["id", "name", "color", "transactionCount"]))
    w.save("balances", spark.createDataFrame(
        [("a1", dt.date(2024, 1, 1), 900.0, "depository"),
         ("a1", dt.date(2024, 1, 2), 950.0, "depository"),
         ("a2", dt.date(2024, 1, 1), 5000.0, "depository")],
        ["account_id", "date", "balance", "accountType"]))
    w.save("recurring", spark.createDataFrame(
        [("r1", dt.date(2024, 3, 1), -55.5, False)], ["id", "date", "amount", "isPast"]))
    w.save("budgets", spark.createDataFrame(
        [
            ("c1", "Food", "Expenses", "expense", dt.date(2024, 1, 1), 200.0, 120.0, 0.0),
            ("c1", "Food", "Expenses", "expense", dt.date(2024, 2, 1), 200.0, 80.0, 80.0),
            ("c2", "Housing", "Expenses", "expense", dt.date(2024, 1, 1), 900.0, 955.5, 0.0),
        ],
        ["category_id", "CategoryName", "CategoryGroupName", "GroupType",
         "Month", "PlannedAmount", "ActualAmount", "RolloverAmount"]))
    w.save("subscription", spark.createDataFrame(
        [("sub1", "STRIPE", None, False, True)],
        "id string, paymentSource string, referralCode string, "
        "isOnFreeTrial boolean, hasPremiumEntitlement boolean"))
    return w


def test_reads(wh):
    assert wh.get_accounts().count() == 2
    # both fixture accounts are depository -> one type row, two subtypes
    opts = wh.get_account_type_options().collect()
    assert len(opts) == 1
    assert opts[0]["type"] == "depository"
    assert opts[0]["possibleSubtypes"] == ["checking", "savings"]
    assert wh.get_transaction_categories().count() == 2
    assert wh.get_institutions().count() == 2
    assert wh.get_aggregate_snapshots().count() == 2  # two distinct dates
    hist = wh.get_account_history("a1")
    assert hist.count() == 2 and hist.collect()[0]["accountName"] == "Checking"


def test_transactions_filter_surface(wh):
    # date range + search, reference-style kwargs
    got = wh.get_transactions(start_date="2024-01-01", end_date="2024-01-31", search="Kroger")
    assert [r["id"] for r in got.collect()] == ["t1"]
    # tri-state: only recurring
    got = wh.get_transactions(is_recurring=True)
    assert [r["id"] for r in got.collect()] == ["t2"]
    # one-sided range raises the reference's error
    with pytest.raises(ValueError, match="both a start_date and end_date"):
        wh.get_transactions(start_date="2024-01-01")
    # summary has the 9 fields
    s = wh.get_transactions_summary().collect()[0]
    assert s["count"] == 4 and s["maxExpense"] == -900.0
    # details + splits
    assert wh.get_transaction_details("t3").count() == 1
    assert [r["id"] for r in wh.get_transaction_splits("t3").collect()] == ["s1"]


def test_tag_filter_applies_before_pagination(wh):
    """tag_ids is a FILTER (the reference's GraphQL filter variables),
    so it must restrict the set BEFORE offset/limit page over it — a
    tagged row that sorts past the page window must still be found."""
    # limit=1: without pre-filtering, the page would be the earliest
    # transaction regardless of tag and the tag filter would empty it
    # (g2 tags a row that does NOT sort first)
    got = wh.get_transactions(tag_ids=["g2"], limit=1).collect()
    assert len(got) == 1 and "g2" in got[0]["tag_ids"]
    # and the page over a tag spanning several rows returns them all
    g1 = wh.get_transactions(tag_ids=["g1"], limit=10).collect()
    assert len(g1) == 2 and all("g1" in r["tag_ids"] for r in g1)


def test_tags_live_counts(wh):
    tags = {r["name"]: r["transactionCount"] for r in wh.get_transaction_tags().collect()}
    assert tags == {"joint": 2, "big": 1}


def test_budgets_window_and_rollups(wh):
    out = wh.get_budgets("2024-01-01", "2024-02-28").collect()
    cat = {(r["CategoryName"], str(r["Month"])): r for r in out if r["GroupOrder"] == 0}
    # remaining = planned + rollover − actual; cumulative runs per category
    jan_food = cat[("Food", "2024-01-01")]
    assert jan_food["RemainingAmount"] == pytest.approx(200.0 - 120.0)
    feb_food = cat[("Food", "2024-02-01")]
    assert feb_food["RemainingAmount"] == pytest.approx(200.0 + 80.0 - 80.0)
    assert feb_food["CumulativeActualAmount"] == pytest.approx(200.0)
    # group rollup + grand total rows exist
    assert any(r["GroupOrder"] != 0 for r in out)
    # one-sided window raises the reference's error text
    with pytest.raises(Exception, match="both a startDate and endDate"):
        wh.get_budgets(start_date="2024-01-01")
    # month filter drops feb when window ends in jan
    jan_only = wh.get_budgets("2024-01-01", "2024-01-31").collect()
    assert all(str(r["Month"]) <= "2024-01-31" for r in jan_only if r["Month"])


def test_subscription_details(wh):
    row = wh.get_subscription_details().collect()[0]
    assert row["hasPremiumEntitlement"] is True and row["paymentSource"] == "STRIPE"


def test_cashflow_with_window(wh):
    rep = wh.get_cashflow(start_date="2024-01-01", end_date="2024-02-28")
    by_cat = {r["category_id"]: r["sum"] for r in rep["byCategory"].collect()}
    assert by_cat["c1"] == pytest.approx(120.0)
    assert by_cat["c2"] == pytest.approx(-55.5 - 900.0 - 400.0)
    s = wh.get_cashflow_summary("2024-01-01", "2024-02-28").collect()[0]
    assert s["savings"] == pytest.approx(120.0 - 1355.5)


def test_mutations_roundtrip(wh):
    new_id = wh.create_transaction(
        "2024-02-10", "a1", 10.123, "Cafe", "c1", notes="espresso"
    )
    row = wh.get_transaction_details(new_id).collect()[0]
    assert row["amount"] == 10.12  # 2dp rounding like the reference
    wh.update_transaction(new_id, notes="double espresso")
    assert wh.get_transaction_details(new_id).collect()[0]["notes"] == "double espresso"
    wh.set_transaction_tags(new_id, ["g2"])
    assert wh.get_transaction_details(new_id).collect()[0]["tag_ids"] == ["g2"]
    assert wh.delete_transaction(new_id) is True
    assert wh.get_transaction_details(new_id).count() == 0
    # deleting a nonexistent id reports False, not a silent True
    assert wh.delete_transaction(new_id) is False
    assert wh.delete_transaction("never-existed") is False

    acc_id = wh.create_manual_account("depository", "checking", True, "Cash", 42.0)
    assert wh.get_accounts().filter(F.col("id") == acc_id).count() == 1
    wh.update_account(acc_id, currentBalance=99.0)
    assert wh.get_accounts().filter(F.col("id") == acc_id).collect()[0]["currentBalance"] == 99.0
    assert wh.delete_account(acc_id) is True
    assert wh.delete_account(acc_id) is False

    wh.create_transaction_tag("vacation", "green")
    assert wh.table("tags").filter("name = 'vacation'").count() == 1

    wh.create_transaction_category("g-exp", "Utilities")
    assert wh.delete_transaction_categories(["cat-Utilities", "cat-Never"]) == [
        True,
        False,
    ]
    # refresh plumbing is a truthful no-op
    assert wh.request_accounts_refresh_and_wait(["a1"]) is True


def test_identical_creates_mint_distinct_ids(wh):
    """Two genuinely identical payloads (same-priced purchases in one
    day, empty notes) must BOTH land with distinct deterministic ids —
    the reference mints a fresh server id per create; silently
    coalescing the second was data loss (ADVICE r7)."""
    id1 = wh.create_transaction("2024-03-03", "a1", 4.5, "Kiosk", "c1")
    id2 = wh.create_transaction("2024-03-03", "a1", 4.5, "Kiosk", "c1")
    try:
        assert id1 != id2
        assert id2.startswith(id1)  # digest prefix + occurrence salt
        for i in (id1, id2):
            assert wh.get_transaction_details(i).count() == 1
    finally:
        wh.delete_transaction(id2)
        wh.delete_transaction(id1)


def test_create_after_partial_delete_avoids_suffix_collision(wh):
    """ADVICE r8: the occurrence salt must be max-suffix+1, not a row
    count. Delete the unsuffixed id while -1 survives, then create the
    identical payload again: a count-based salt (n_prior=1) would
    re-mint -1, which the insert's anti-join silently swallows —
    exactly the loss class the salting exists to prevent."""
    id1 = wh.create_transaction("2024-03-04", "a1", 7.25, "Stand", "c1")
    id2 = wh.create_transaction("2024-03-04", "a1", 7.25, "Stand", "c1")
    id3 = None
    try:
        assert id2 == f"{id1}-1"
        assert wh.delete_transaction(id1) is True  # -1 survives
        id3 = wh.create_transaction("2024-03-04", "a1", 7.25, "Stand", "c1")
        assert id3 == f"{id1}-2"  # NOT a re-mint of the surviving -1
        for i in (id2, id3):
            assert wh.get_transaction_details(i).count() == 1
    finally:
        for i in (id2, id3):
            if i is not None:
                wh.delete_transaction(i)


def test_account_holdings_connection(wh):
    """S5 — holdings connection round trip over the warehouse
    (monarchmoney.py:725-793; golden shape
    tests/get_account_holdings.json:1-45): latest snapshot per position
    type, W4 one-day change from the prior snapshot."""
    rows = wh.get_account_holdings("a1").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["account_id"] == "a1"
    assert r["type_display"] == "depository"
    assert r["total_value"] == pytest.approx(950.0)
    assert r["one_day_change"] == pytest.approx(50.0)  # 950 - 900
    # first-observation accounts have a NULL change, like the reference
    # fixture's null securityPriceChange*
    r2 = wh.get_account_holdings("a2").collect()[0]
    assert r2["one_day_change"] is None


#: the reference's golden type/subtype matrix
#: (tests/get_account_type_options.json, asserted positionally in
#: test_monarchmoney.py:122-158: 10 entries, 'loan' duplicated
#: server-side -> 9 unique types). Data fixture, not code.
_GOLDEN_TYPE_MATRIX = {
    "depository": ["cash_management", "cd", "checking", "money_market",
                   "paypal", "prepaid", "savings"],
    "brokerage": None,  # 47 subtypes; spot-check membership below
    "real_estate": ["primary_home", "rental_property", "secondary_home"],
    "vehicle": ["bicycle", "boat", "car", "motorcycle", "other", "snowmobile"],
    "valuables": ["art", "collectibles", "furniture", "jewelry", "other"],
    "credit": ["credit_card"],
    "loan": ["auto", "business", "commercial", "construction", "consumer",
             "home", "home_equity", "line_of_credit", "loan", "mortgage",
             "overdraft", "student"],
    "other_asset": ["other"],
    "other_liability": ["other"],
}


def test_account_type_options_golden(spark, tmp_path):
    """Golden-fixture parity for get_account_type_options
    (monarchmoney.py:214-246): feed an accounts table enumerating the
    reference fixture's full type/subtype matrix and assert the
    per-type possibleSubtypes come back exactly."""
    from dieter___etl___monarchmoney_spark.api import FinanceWarehouse

    w = FinanceWarehouse(spark, str(tmp_path / "golden_wh"))
    combos = []
    brokerage_sample = ["brokerage", "ira", "roth", "st_401k", "cryptocurrency",
                       "hsa_like_misnamed"]  # subset incl. a non-fixture extra
    for typ, subs in _GOLDEN_TYPE_MATRIX.items():
        for sub in (subs or brokerage_sample):
            combos.append((f"id-{typ}-{sub}", f"{typ}/{sub}", typ, sub, 0.0, "Inst"))
    w.save("accounts", spark.createDataFrame(
        combos,
        ["id", "displayName", "type", "subtype", "currentBalance", "institutionName"],
    ))
    got = {r["type"]: r["possibleSubtypes"] for r in w.get_account_type_options().collect()}
    assert len(got) == 9  # 10 fixture entries, 'loan' duplicated
    assert sorted(got) == sorted(_GOLDEN_TYPE_MATRIX)
    for typ, subs in _GOLDEN_TYPE_MATRIX.items():
        if subs is not None:
            assert got[typ] == subs, typ
    assert got["brokerage"] == sorted(brokerage_sample)
    # positional parity with the reference's asserts: first three type
    # names by the fixture's ordering are present
    for name in ("depository", "brokerage", "real_estate"):
        assert name in got
