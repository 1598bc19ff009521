"""Budget pipeline fixture tests — the reference's manual reconciliation
checklist as assertions (.DevContext/Budget_Specs.md:173-204):
debit/credit flags, remaining arithmetic, cumulative ≥ actual, sentinel
rows, expected volume."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from dieter___etl___monarchmoney_spark.operators.budgets import (
    budget_pipeline,
    budget_rows,
    flatten_budget_documents,
)


def _docs(spark):
    def m(month, planned, actual, rollover=0.0):
        return Row(
            month=month,
            plannedCashFlowAmount=planned,
            actualAmount=actual,
            previousMonthRolloverAmount=rollover,
        )

    rows = [
        Row(
            category=Row(id="c1", name="Groceries"),
            categoryGroup=Row(id="g1", name="Food", type="expense"),
            monthlyAmounts=[
                m("2024-01-01", 500.0, 450.0),
                m("2024-02-01", 500.0, 520.0, 50.0),
            ],
        ),
        Row(
            category=Row(id="c2", name="Salary"),
            categoryGroup=Row(id="g2", name="Income", type="income"),
            monthlyAmounts=[m("2024-01-01", 4000.0, 4000.0), m("2024-02-01", 4000.0, 4100.0)],
        ),
    ]
    return spark.createDataFrame(rows)


def test_flatten_explodes_category_months(spark):
    flat = flatten_budget_documents(_docs(spark))
    assert flat.count() == 4
    r = flat.filter("category_id = 'c1' AND Month = DATE'2024-02-01'").collect()[0]
    assert r["PlannedAmount"] == 500.0 and r["RolloverAmount"] == 50.0


def test_budget_rows_invariants(spark):
    rows = budget_rows(flatten_budget_documents(_docs(spark))).collect()
    by = {(r["category_id"], r["Month"]): r for r in rows}
    jan = by[("c1", dt.date(2024, 1, 1))]
    feb = by[("c1", dt.date(2024, 2, 1))]
    # DebitCreditFlag ⇔ group type (Budget_Specs.md:92-109)
    assert jan["DebitCreditFlag"] == "Debit"
    assert by[("c2", dt.date(2024, 1, 1))]["DebitCreditFlag"] == "Credit"
    # remaining = planned + rollover - actual (monarchmoney.py:1146)
    assert jan["RemainingAmount"] == pytest.approx(50.0)
    assert feb["RemainingAmount"] == pytest.approx(500.0 + 50.0 - 520.0)
    # cumulative is a running total ≥ actual (Budget_Specs.md:189)
    assert jan["CumulativeActualAmount"] == pytest.approx(450.0)
    assert feb["CumulativeActualAmount"] == pytest.approx(970.0)
    assert feb["CumulativeActualAmount"] >= feb["ActualAmount"]


def test_budget_pipeline_sentinel_rows(spark):
    out = budget_pipeline(flatten_budget_documents(_docs(spark))).collect()
    orders = [r["GroupOrder"] for r in out]
    # category rows first, group rows (998), Totals (999) last (O3 sort)
    assert orders == sorted(orders)
    totals = [r for r in out if r["GroupOrder"] == 999]
    assert {r["CategoryGroupName"] for r in totals} == {"Totals"}
    assert len(totals) == 2  # one per month
    jan_tot = next(r for r in totals if r["Month"] == dt.date(2024, 1, 1))
    assert jan_tot["PlannedAmount"] == pytest.approx(4500.0)
    assert jan_tot["ActualAmount"] == pytest.approx(4450.0)
    assert jan_tot["CumulativeActualAmount"] is None
    groups = [r for r in out if r["GroupOrder"] == 998]
    assert len(groups) == 4  # 2 groups × 2 months
    # expected volume: categories×months + groups×months + months
    assert len(out) == 4 + 4 + 2
