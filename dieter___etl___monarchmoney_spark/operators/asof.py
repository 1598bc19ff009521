"""As-of (backward temporal) join — an operator Spark lacks natively.

For each left row, find the right row with the greatest timestamp ≤ the
left row's timestamp within the same key (inclusive). The naive form is
a range join (quadratic blowup per key); the scalable form implemented
here is union-tag + ordered window carry:

1. tag left rows ``_side=1`` and right rows ``_side=0``;
2. union them and sort within each key by (ts, _side, tiebreak) — at
   equal timestamps the right row sorts FIRST, giving the inclusive
   ``right.ts <= left.ts`` semantics;
3. a running ``last(..., ignoreNulls)`` window carries the most recent
   right payload forward onto every subsequent left row;
4. keep only left rows.

ONE shuffle on the key, no per-row range probe, no pair explosion —
the shape that survives a 100 TB fact on both sides. DuckDB's native
ASOF JOIN plays the oracle (queries/scale_ops.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Backward as-of join (left join semantics: unmatched left rows keep
    nulls). The right side's non-key, non-ts columns come back prefixed
    ``asof_``, plus ``asof_<ts_col>`` with the matched row's timestamp.

    ``tiebreak`` columns (right-side, pre-prefix names) break exact
    timestamp ties deterministically — the LAST by tiebreak order wins,
    mirroring "latest record at that instant".
    """
    payload = [c for c in right.columns if c not in keys and c != ts_col]
    r = right.select(
        *keys,
        F.col(ts_col),
        *[F.col(c).alias(f"asof_{c}") for c in payload],
        F.col(ts_col).alias(f"asof_{ts_col}"),
    )
    u = left.withColumn("_side", F.lit(1)).unionByName(
        r.withColumn("_side", F.lit(0)), allowMissingColumns=True
    )
    order = [F.col(ts_col).asc(), F.col("_side").asc()] + [
        F.col(f"asof_{c}").asc() for c in tiebreak
    ]
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof_cols = [f"asof_{c}" for c in payload] + [f"asof_{ts_col}"]
    carried = u.select(
        *[c for c in left.columns],
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in asof_cols],
        "_side",
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
