"""Column-order contracts (SURVEY.md §2.6 O7, §1.1 layer 3).

The reference's sinks have a contractually fixed column order: a priority
prefix (the "sacred" 31-column Transactions layout,
.DevContext/CRITICAL-START-HERE.md:29-62, enforced by `_headers_rows`
MonarchMoneyMain-v3.py:139-179) followed by any unknown columns appended
in sorted order — a semi-dynamic schema: priority columns fixed, extras
tolerated.

This is a deterministic ``select``, not a Catalyst rule (SURVEY.md §4):
column ordering is a sink contract, not an optimization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the Transactions priority prefix (flattened contract, FIXTURES.md §2)
TRANSACTIONS_PRIORITY = (
    "id",
    "date",
    "amount",
    "AccID",
    "AccDispName",
    "AccType",
    "CatID",
    "CatDispName",
    "CatType",
    "MrchntID",
    "MrchntDispName",
    "MrchntTranCount",
    "MrchntType",
    "TagsCSL",
    "pending",
    "plaidName",
    "notes",
    "isRecurring",
    "reviewStatus",
    "needsReview",
    "isSplitTransaction",
    "hideFromReports",
    "createdAt",
    "updatedAt",
    "loadedAtUtc",
)


def apply_column_contract(
    df: DataFrame,
    priority: Sequence[str],
    *,
    drop: Sequence[str] = (),
    fill_missing: bool = False,
) -> DataFrame:
    """Reorder to ``priority`` first (skipping absent names unless
    ``fill_missing`` adds them as NULL), then the remaining columns in
    sorted order (`_headers_rows` MonarchMoneyMain-v3.py:164-176), minus
    ``drop`` (P10 redundant-column drop, :167-169)."""
    present = set(df.columns) - set(drop)
    head = []
    for c in priority:
        if c in present:
            head.append(F.col(c))
            present.discard(c)
        elif fill_missing:
            head.append(F.lit(None).alias(c))
    tail = [F.col(c) for c in sorted(present)]
    return df.select(*head, *tail)
