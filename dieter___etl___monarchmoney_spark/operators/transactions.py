"""The parametrized transactions query (SURVEY.md §2.2 P1-P10, §2.6 O4-O6,
§2.5 W5).

Parity target: ``get_transactions(limit, offset, start_date, end_date,
search, category_ids, account_ids, tag_ids, …)``
(monarchmoney.py:1403-1554) — the reference builds a GraphQL variables
dict and a remote server executes it; the filter-variable dict is
precisely the spec for this function's keyword surface.

Spark-first notes:
- every predicate is a Column expression, so Catalyst pushes it into the
  Parquet scan (PushedFilters) — the engine-native form of the
  reference's "server-side pushdown";
- the reference's pagination loop (_fetch_all_transactions,
  MonarchMoneyMain-v3.py:344-391) exists only to bound driver memory and
  is obsolete under a distributed scan; ``offset``/``limit`` are exposed
  for API parity only and use a deterministic total order (date, id) —
  the reference orders by date alone, which is unstable across pages;
- the tri-state booleans (absent ⇒ no filter, monarchmoney.py:1522-1542)
  become a conditional filter chain built from non-None kwargs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: offset+limit ceiling for the TakeOrderedAndProject plan: beyond this,
#: the per-task top-k buffer (2·k object refs) stops being "page-sized"
#: and pagination falls back to a row_number window.
_TAKE_ORDERED_MAX_ROWS = 1_000_000


def transactions_query(
    txns: DataFrame,
    *,
    start_date: str | None = None,
    end_date: str | None = None,
    search: str | None = None,
    search_columns: Sequence[str] = (),
    category_ids: Sequence | None = None,
    account_ids: Sequence | None = None,
    merchant_ids: Sequence | None = None,
    tag_ids: Sequence | None = None,
    tag_col: str = "tag_ids",
    flags: dict[str, object] | None = None,
    order_by: Sequence[str] = ("txn_date", "txn_id"),
    offset: int = 0,
    limit: int | None = None,
) -> DataFrame:
    """Filter + order + paginate the transactions fact.

    ``flags`` is the tri-state boolean surface (P5): a mapping of
    column → required value; keys with value None are ignored (absent ⇒
    no filter), matching monarchmoney.py:1522-1542.
    """
    df = txns

    # P2 — date range with both-or-neither validation (monarchmoney.py:1544-1550)
    if (start_date is None) != (end_date is None):
        raise ValueError(
            "You must specify both a start_date and end_date, not just one of them."
        )
    if start_date is not None:
        df = df.filter(F.col("txn_date").between(F.lit(start_date), F.lit(end_date)))

    # P3 — substring search over an explicit column set (monarchmoney.py:1514-1515)
    if search:
        if not search_columns:
            raise ValueError("search requires search_columns")
        pred: Column = F.lit(False)
        for c in search_columns:
            pred = pred | F.col(c).contains(search)
        df = df.filter(pred)

    # P4 — IN-list predicates (monarchmoney.py:1516-1518)
    for col, ids in (
        ("category_id", category_ids),
        ("account_id", account_ids),
        ("merchant_id", merchant_ids),
    ):
        if ids:
            df = df.filter(F.col(col).isin(list(ids)))

    # tag overlap — BEFORE pagination, like every other predicate: the
    # reference passes tagIds in the GraphQL filter variables
    # (monarchmoney.py:1519-1520), so offset/limit page over the TAGGED
    # result set. Filtering an already-truncated page returns short (or
    # empty) pages whenever matches sort past the window — the round-7
    # wrong-answer bug this operator now owns structurally for every
    # caller (api.get_transactions delegates here).
    if tag_ids:
        elem = df.schema[tag_col].dataType.elementType.simpleString()
        df = df.filter(
            F.arrays_overlap(
                F.col(tag_col),
                F.array(*[F.lit(t).cast(elem) for t in tag_ids]),
            )
        )

    # P5 — tri-state flag filters (monarchmoney.py:1522-1542)
    for col, val in (flags or {}).items():
        if val is not None:
            df = df.filter(F.col(col) == F.lit(val))

    # O4/W5/O5 — stable order + offset/limit pagination. Negative
    # values get a clear client-side ValueError (same validation style
    # as the both-or-neither date rule) instead of surfacing as a
    # Spark AnalysisException from deep inside the plan.
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset}")
    if limit is not None and limit < 0:
        raise ValueError(f"limit must be >= 0, got {limit}")
    # TakeOrderedAndProject allocates a 2·(offset+limit) top-k buffer
    # PER TASK (guava TopKSelector eagerly news the array), so a large
    # offset OOMs executors regardless of data size — a deep page-through
    # or a fat-fingered offset must not be able to kill the job. Past the
    # threshold, switch to the row_number page (one global-window rank,
    # O(data) memory); below it, keep the top-k plan (no full sort).
    if limit is not None or offset:
        if offset + (limit or 0) > _TAKE_ORDERED_MAX_ROWS:
            if limit is not None:
                return paginate_row_number(df, order_by, offset, limit)
            # The trailing orderBy keeps this path's output-order
            # contract identical to the sub-threshold orderBy path —
            # without it the order held only incidentally (the global
            # window collapses to one partition today).
            w = Window.orderBy(*[F.col(c) for c in order_by])
            return (
                df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") > offset)
                .drop("rn")
                .orderBy(*order_by)
            )
        df = df.orderBy(*order_by)
        if offset:
            df = df.offset(offset)
        if limit is not None:
            df = df.limit(limit)
    elif all(c in df.columns for c in order_by):
        # the unpaginated path honors order_by too — "Filter + order +
        # paginate" is the contract, and silently returning partition
        # order is invisible in single-partition tests while breaking
        # full ordered exports at scale. (Filter-only uses on frames
        # WITHOUT the default order columns keep working: ordering an
        # unorderable frame is skipped, pagination on one still raises.)
        df = df.orderBy(*order_by)
    return df


def paginate_row_number(
    df: DataFrame, order_by: Sequence[str], offset: int, limit: int
) -> DataFrame:
    """W5 alternative — explicit row_number pagination for engines/sinks
    that need the rank materialized (results(offset, limit, orderBy)
    monarchmoney.py:1444-1452).

    Scale caveat: a global Window.orderBy funnels to a single partition —
    fine for page-sized outputs (the only use the reference has), wrong
    for bulk export; use offset/limit (TakeOrderedAndProject) instead.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > offset) & (F.col("rn") <= offset + limit))
        .drop("rn")
        .orderBy(*order_by)
    )


def point_lookup(df: DataFrame, id_col: str, key) -> DataFrame:
    """S9 — single-row lookup by id (get_transaction_details
    monarchmoney.py:1979-2127). A filter Catalyst turns into row-group
    pruning on a sorted/partitioned layout."""
    return df.filter(F.col(id_col) == F.lit(key))


def coalesce_account_id(df: DataFrame, candidates: Sequence[str], out: str = "account_id") -> DataFrame:
    """P9 — null-safe field coalescing across candidate columns
    (_txn_account_id MonarchMoneyMain-v3.py:290-304)."""
    return df.withColumn(out, F.coalesce(*[F.col(c) for c in candidates]))
