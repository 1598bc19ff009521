"""Banded interval (range) join — a custom operator Spark lacks natively.

The reference has no theta/range joins (SURVEY.md §2.3 note), but a
time-band probe — "find every B event within `band` after an A event for
the same key" — is the natural next question over its recurring/forecast
stream (monarchmoney.py:2678-2715: expected vs actual events in a time
window). Spark's only native plan for the raw inequality predicate is a
broadcast-nested-loop or a per-key cross product; at fact×fact scale both
are quadratic.

The scale-safe plan is **band bucketing**: quantize both sides' event
times into buckets of exactly the band width. A right-side event inside
``(t, t + band]`` can only live in the left event's bucket or the next
one, so exploding the left side into its two candidate buckets turns the
range probe into a plain equi-join on ``(key, bucket)`` — shuffle-
partitioned, AQE-skew-splittable, no pair explosion beyond true
candidates. The residual exact band predicate filters the ≤2× candidate
surplus after the join. Cost: one extra copy of the (narrow) left side;
plan: one hash shuffle per side, zero nested loops.

`DuckDB oracle`: the same semantics as a naive inequality join — two
different algorithms must agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    band_seconds: int,
) -> DataFrame:
    """All (left, right) rows sharing ``key`` with
    ``left_ts < right_ts <= left_ts + band_seconds``.

    Returns the left columns plus the right columns (callers project /
    alias before joining to avoid name collisions) plus ``gap_micros``.
    Timestamps compare in exact integer microseconds, so the band edge
    is tie-free and engine-independent.
    """
    band_us = band_seconds * 1_000_000

    def bucket(ts: Column) -> Column:
        return F.floor(F.unix_micros(ts) / F.lit(band_us))

    lb = left.withColumn(
        "_bucket", F.explode(F.array(bucket(F.col(left_ts)), bucket(F.col(left_ts)) + 1))
    )
    rb = right.withColumn("_bucket", bucket(F.col(right_ts)))

    gap = F.unix_micros(F.col(right_ts)) - F.unix_micros(F.col(left_ts))
    return (
        lb.join(rb, [key, "_bucket"])
        .filter((gap > 0) & (gap <= band_us))
        .withColumn("gap_micros", gap)
        .drop("_bucket")
    )
