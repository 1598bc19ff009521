"""Local replica of the driver's oracle comparison: run the Spark query
and the DuckDB SQL on the same parquet tables, sort columns by name,
compare row-count + schema-shape + values (order-insensitive)."""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd


def _norm_cell(v):
    import decimal

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, decimal.Decimal):
        # a Decimal reaching the comparator means the oracle SQL produced a
        # DECIMAL column where Spark produces DOUBLE — a type drift the
        # driver's value hash would flag even when values are equal
        raise AssertionError(f"oracle produced DECIMAL {v!r}; CAST it to DOUBLE in the SQL")
    if isinstance(v, float):
        # mirror a hash over short repr; flag FP drift at 1e-9 relative
        return round(v, 9) if abs(v) < 1e9 else round(v, 2)
    if isinstance(v, (_dt.datetime, pd.Timestamp)):
        ts = pd.Timestamp(v)
        # duckdb's .df() widens DATE to datetime64; treat midnight as date
        return ts.date().isoformat() if ts == ts.normalize() else ts.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm_cell)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(str)).reset_index(
        drop=True
    )


def _check_dtype_kinds(got_raw: pd.DataFrame, want_raw: pd.DataFrame) -> None:
    """Pin the int-vs-float repr class: DuckDB widens HUGEINT (e.g. a
    windowed SUM over ints) to float64 while Spark returns int64 —
    values equal, but a repr-based driver hash sees 3.0 vs 3. Caught
    live as the r2 sessionization red row; CAST ... AS BIGINT in the
    oracle whenever this fires."""
    for c in set(got_raw.columns) & set(want_raw.columns):
        sk, ok = got_raw[c].dtype.kind, want_raw[c].dtype.kind
        if sk != ok and {sk, ok} <= {"i", "u", "f"} and "f" in (sk, ok):
            raise AssertionError(
                f"dtype drift on {c!r}: spark={got_raw[c].dtype} duckdb="
                f"{want_raw[c].dtype} — repr-hash hazard, CAST the oracle column"
            )


def compare(spark_df, duck_rel) -> None:
    got_raw, want_raw = spark_df.toPandas(), duck_rel.df()
    _check_dtype_kinds(got_raw, want_raw)
    got = normalize(got_raw)
    want = normalize(want_raw)
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
