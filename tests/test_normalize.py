"""Golden-fixture tests for the flatten layer, mirroring the reference's
fixture pattern (monarchmoney/tests/test_monarchmoney.py:28-76: canned
nested docs → assert specific flattened cells)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dieter___etl___monarchmoney_spark.functions.dates import (
    month_end,
    month_start,
    parse_date_tolerant,
)
from dieter___etl___monarchmoney_spark.functions.money import clean_currency
from dieter___etl___monarchmoney_spark.functions.nested import tags_csl, unwrap_connection
from dieter___etl___monarchmoney_spark.operators.normalize import (
    flatten_accounts,
    flatten_transactions,
)
from dieter___etl___monarchmoney_spark.plans.contract import apply_column_contract


def _nested_txns(spark):
    rows = [
        Row(
            id="t1",
            amount="$1,234.56",
            date="2024-01-15",
            createdAt="2024-01-15T10:00:00Z",
            updatedAt="2024-01-16T11:30:00Z",
            notes="groceries",
            account=Row(id="a1", displayName=None, type="depository"),
            category=Row(id="c1", name="Food", type="expense"),
            merchant=Row(id="m1", name="Kroger", transactionsCount=12, type="grocery"),
            tags=[Row(name="joint"), Row(name="monthly")],
        ),
        Row(
            id="t2",
            amount="(45.00)",
            date="2024-01-20",
            createdAt="2024-01-20T00:00:00Z",
            updatedAt="2024-01-20T00:00:00Z",
            notes=None,
            account=Row(id="a2", displayName="Checking", type="depository"),
            category=Row(id="c2", name="Salary", type="income"),
            merchant=Row(id="m2", name="Acme", transactionsCount=1, type=None),
            tags=[],
        ),
    ]
    return spark.createDataFrame(rows)


def test_flatten_transactions_contract(spark):
    accounts = spark.createDataFrame(
        [Row(id="a1", displayName="Savings"), Row(id="a2", displayName="Checking")]
    )
    out = flatten_transactions(
        _nested_txns(spark), accounts_dim=accounts, load_ts="2024-02-01 00:00:00"
    )
    rows = {r["id"]: r for r in out.collect()}
    # struct breakout + currency clean + accounting negative
    assert rows["t1"]["AccID"] == "a1"
    assert rows["t1"]["amount"] == pytest.approx(1234.56)
    assert rows["t2"]["amount"] == pytest.approx(-45.00)
    # J1 enrichment fills the missing display name only
    assert rows["t1"]["AccDispName"] == "Savings"
    assert rows["t2"]["AccDispName"] == "Checking"
    # tags CSL
    assert rows["t1"]["TagsCSL"] == "joint, monthly"
    assert rows["t2"]["TagsCSL"] == ""
    # timestamps parsed, loadedAtUtc stamped
    assert rows["t1"]["createdAt"] == dt.datetime(2024, 1, 15, 10, 0)
    assert rows["t1"]["loadedAtUtc"] == dt.datetime(2024, 2, 1)
    # raw structs dropped (P10)
    assert "account" not in out.columns and "tags" not in out.columns
    # priority columns lead in contract order
    assert out.columns[:3] == ["id", "date", "amount"]


def test_flatten_accounts_fixture(spark):
    # shaped like monarchmoney/tests/get_accounts.json rows
    rows = [
        Row(
            id="900000002",
            displayName="Brokerage",
            currentBalance=1000.02,
            type=Row(name="brokerage", display="Investments"),
            subtype=Row(name="roth", display="Roth IRA"),
            institution=Row(name="Fidelity"),
        ),
        Row(
            id="900000003",
            displayName="Mortgage",
            currentBalance=-250000.0,
            type=Row(name="loan", display="Loans"),
            subtype=Row(name="mortgage", display="Mortgage"),
            institution=Row(name="Chase"),
        ),
    ]
    out = flatten_accounts(spark.createDataFrame(rows))
    got = out.collect()
    assert [r["TypeDisplay"] for r in got] == ["Investments", "Loans"]
    assert got[0]["AccountType"] == "Roth IRA"
    assert got[1]["InstitutionName"] == "Chase"
    assert "type" not in out.columns


def test_clean_currency_semantics(spark):
    df = spark.createDataFrame(
        [("$1,234.56",), ("(12.34)",), ("",), ("  7 ",), ("junk",), (None,)],
        ["v"],
    ).select(clean_currency("v").alias("c"))
    got = [r["c"] for r in df.collect()]
    assert got[0] == pytest.approx(1234.56)
    assert got[1] == pytest.approx(-12.34)
    assert got[2] == 0.0
    assert got[3] == pytest.approx(7.0)
    assert got[4] is None  # unparseable -> NULL (typed analog of warn+keep)
    assert got[5] == 0.0  # None -> trim -> '' -> 0.0 like float('' or 0)


def test_parse_date_tolerant_formats(spark):
    df = spark.createDataFrame(
        [("2024-01-15",), ("1/15/2024",), ("15/1/2024",), ("2024/1/15",), ("nope",)],
        ["v"],
    ).select(parse_date_tolerant("v").alias("d"))
    got = [r["d"] for r in df.collect()]
    assert got[0] == got[1] == got[2] == got[3] == dt.date(2024, 1, 15)
    assert got[4] is None


def test_month_window_arithmetic(spark):
    df = spark.createDataFrame([(dt.date(2024, 2, 15),)], ["d"]).select(
        month_start("d").alias("start"), month_end("d", 1).alias("end")
    )
    r = df.collect()[0]
    assert r["start"] == dt.date(2024, 2, 1)
    assert r["end"] == dt.date(2024, 3, 31)


def test_unwrap_connection(spark):
    # GraphQL connection shape (holdings scan, monarchmoney.py:731-777)
    df = spark.createDataFrame(
        [Row(edges=[Row(node=Row(id="h1", quantity=3.0)), Row(node=Row(id="h2", quantity=1.5))])]
    )
    out = unwrap_connection(df)
    assert sorted(r["id"] for r in out.collect()) == ["h1", "h2"]
    assert set(out.columns) == {"id", "quantity"}


def test_contract_fill_missing_and_extras(spark):
    df = spark.createDataFrame([Row(b=1, z=2, a=3, drop_me=4)])
    out = apply_column_contract(
        df, priority=("a", "missing", "b"), drop=("drop_me",), fill_missing=True
    )
    assert out.columns == ["a", "missing", "b", "z"]
    assert out.collect()[0]["missing"] is None


def test_get_accounts_golden_parity(spark):
    """Mirror the reference's get_accounts golden assertions
    (test_monarchmoney.py:28-76 over tests/get_accounts.json: 7
    accounts; positional checks on displayName, currentBalance, isAsset,
    subtype.display, isManual, institution.name, id, type.name) through
    the full ingestion path: JSON payload -> ingest -> envelope unwrap
    -> typed frame. Synthetic payload, same structure and assertion
    points as the fixture."""
    from dieter___etl___monarchmoney_spark.sources.json_ingest import (
        ingest_documents,
        unwrap_envelope,
    )

    def acct(i, name, bal, is_asset, sub_disp, is_manual, inst, typ):
        return {
            "id": f"9000000003{i}" if i == 6 else f"90000000{i:03d}",
            "displayName": name,
            "currentBalance": bal,
            "isAsset": is_asset,
            "isManual": is_manual,
            "type": {"name": typ, "display": typ.title()},
            "subtype": {"name": sub_disp.lower().replace(" ", "_"), "display": sub_disp},
            "institution": {"name": inst},
        }

    payload = {
        "accounts": [
            acct(0, "Brokerage", 3000.0, True, "Brokerage", False, "Fid", "brokerage"),
            acct(1, "Checking", 1000.02, True, "Checking", False, "Chase", "depository"),
            acct(2, "Credit Card", -50.0, False, "Credit Card", False, "Amex", "credit"),
            acct(3, "Retirement", 9000.0, True, "Roth IRA", False, "Fid", "brokerage"),
            acct(4, "Savings", 500.0, True, "Savings", False, "Ally", "depository"),
            acct(5, "401k", 7000.0, True, "St 401k", True, "Rando Employer Investments", "brokerage"),
            acct(6, "Car Loan", -8000.0, False, "Auto", False, "Bank", "loan"),
        ]
    }
    # the accounts envelope is a plain list under 'accounts' -> treat the
    # payload like a one-document connection and unwrap
    df = ingest_documents(spark, [payload])
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    assert isinstance(df.schema["accounts"].dataType, T.ArrayType)
    flat = df.select(F.explode("accounts").alias("a")).select("a.*")
    rows = flat.collect()
    assert len(rows) == 7
    by_name = {r["displayName"]: r for r in rows}
    assert by_name["Brokerage"]["displayName"] == "Brokerage"
    assert by_name["Checking"]["currentBalance"] == 1000.02
    assert by_name["Credit Card"]["isAsset"] is False
    assert by_name["Retirement"]["subtype"]["display"] == "Roth IRA"
    assert by_name["Savings"]["isManual"] is False
    assert by_name["401k"]["institution"]["name"] == "Rando Employer Investments"
    assert by_name["Car Loan"]["id"] == "90000000036"
    assert by_name["Car Loan"]["type"]["name"] == "loan"

    # and the processed form keeps the reference's flattened contract
    out = flatten_accounts(flat)
    assert {"TypeDisplay", "AccountType", "InstitutionName"} <= set(out.columns)
