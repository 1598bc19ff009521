"""Custom Python Data Source: paged JSON connection scans (SURVEY.md
§2.1 S1/S3, §7.4 "Optional custom DataSource").

The reference's extraction core is a SERIAL pagination loop — fetch a
page of ``limit`` records at ``offset``, append, repeat until short page
(``results(offset, limit, orderBy)`` monarchmoney.py:1444-1452 driven by
the while-loop in MonarchMoneyMain-v3.py:1276-1302). The Spark-first
re-expression: each page is an ``InputPartition``, so the pages a
single-threaded client fetched one after another become parallel tasks —
the planner sees one scan, the cluster fetches every page at once, and
downstream operators consume a normal DataFrame.

The payload here is a JSON-lines file standing in for the remote API
(the container has no network; the page slicing, partition planning, and
schema contract are the real thing). A live deployment swaps
``_fetch_page`` for the HTTP call — with the T6 retry wrapper
(json_ingest.with_retries) around it — and nothing else changes.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

DEFAULT_PAGE_SIZE = 500  # TXN_PAGE_LIMIT, MonarchMoneyMain-v3.py:42


class PageRange(InputPartition):
    """One page of the connection: [offset, offset + limit)."""

    def __init__(self, offset: int, limit: int):
        self.offset = offset
        self.limit = limit


class PagedJsonDataSource(DataSource):
    """``spark.read.format("paged_json")`` — options:

    - ``path``: JSON-lines file, one record per line (the "server");
    - ``pageSize``: records per page / partition (default 500);
    - ``filterPushdown``: "true" opts into server-side predicate
      pushdown. Opt-IN because Spark refuses any reader that merely
      IMPLEMENTS ``pushFilters`` while
      ``spark.sql.python.filterPushdown.enabled`` is false — a session
      this package didn't build may have it off, so the capability must
      not be ambient;
    - user-supplied ``.schema(...)`` is required — the reference's
      typed-column contract (O7) applies at the connector edge, not
      after a permissive infer.
    """

    @classmethod
    def name(cls) -> str:
        return "paged_json"

    def schema(self):
        raise ValueError(
            "paged_json requires an explicit .schema(...) — the column "
            "contract is part of the connector surface (SURVEY §2.6 O7)"
        )

    def reader(self, schema: StructType) -> "PagedJsonReader":
        if self.options.get("filterpushdown", "false").lower() == "true":
            return PushdownPagedJsonReader(schema, self.options)
        return PagedJsonReader(schema, self.options)


class PagedJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("paged_json requires option 'path'")
        self.page_size = int(options.get("pagesize", DEFAULT_PAGE_SIZE))
        self.pushed: list = []

    def _matches(self, rec: dict) -> bool:
        from pyspark.sql import datasource as ds

        for f in self.pushed:
            v = rec.get(f.attribute[0])
            if isinstance(f, ds.IsNull):
                ok = v is None
            elif isinstance(f, ds.IsNotNull):
                ok = v is not None
            elif v is None:
                ok = False  # NULL compares unknown -> filtered
            elif isinstance(f, ds.EqualTo):
                ok = v == f.value
            elif isinstance(f, ds.In):
                ok = v in f.value
            elif isinstance(f, ds.GreaterThan):
                ok = v > f.value
            elif isinstance(f, ds.GreaterThanOrEqual):
                ok = v >= f.value
            elif isinstance(f, ds.LessThan):
                ok = v < f.value
            else:
                ok = v <= f.value
            if not ok:
                return False
        return True

    def _count_records(self) -> int:
        # planning-time metadata probe (the reference's totalCount field,
        # monarchmoney.py:1436) — counts lines, reads no record bodies
        n = 0
        with open(self.path, "rb") as f:
            for line in f:
                if line.strip():
                    n += 1
        return n

    def partitions(self):
        total = self._count_records()
        if total == 0:
            return [PageRange(0, self.page_size)]
        return [
            PageRange(off, self.page_size)
            for off in range(0, total, self.page_size)
        ]

    def read(self, partition: PageRange):
        """Executor-side page fetch: each task materializes ONLY its
        page — the distributed twin of the reference's per-request
        ``results[offset : offset+limit]`` — and applies the pushed
        predicates before emitting (the "server-side" filter)."""
        fields = [f.name for f in self.schema_.fields]
        lo, hi = partition.offset, partition.offset + partition.limit
        with open(self.path, "rb") as f:
            i = 0
            for line in f:
                if not line.strip():
                    continue
                if i >= hi:
                    break
                if i >= lo:
                    rec = json.loads(line)
                    if self._matches(rec):
                        yield tuple(rec.get(name) for name in fields)
                i += 1


class PushdownPagedJsonReader(PagedJsonReader):
    """The ``filterPushdown=true`` variant: implements ``pushFilters``.
    A separate class because Spark REJECTS any reader that implements
    the method while ``spark.sql.python.filterPushdown.enabled`` is
    false — the capability must be requested, not ambient."""

    def pushFilters(self, filters):
        """Absorb the predicates a paged API evaluates server-side (the
        reference's filter arguments, monarchmoney.py:1510-1550): simple
        comparisons, IN lists, and null checks on top-level columns.
        Absorbed filters are NOT returned — this reader applies them
        exactly (SQL ternary semantics: a comparison on a missing/null
        value excludes the record), so Spark need not re-evaluate;
        anything else is yielded back for post-scan evaluation."""
        from pyspark.sql import datasource as ds

        supported = (
            ds.EqualTo,
            ds.In,
            ds.GreaterThan,
            ds.GreaterThanOrEqual,
            ds.LessThan,
            ds.LessThanOrEqual,
            ds.IsNull,
            ds.IsNotNull,
        )
        for f in filters:
            if isinstance(f, supported) and len(f.attribute) == 1:
                self.pushed.append(f)
            else:
                yield f


def register(spark) -> None:
    """Idempotent registration of the format with a session.

    The class ships to Python workers BY VALUE
    (cloudpickle.register_pickle_by_value): a by-reference pickle would
    require this package on every worker's import path, which a host
    harness driving an arbitrary cwd/session may not provide."""
    import sys

    import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    try:
        spark.dataSource.register(PagedJsonDataSource)
    except Exception as exc:  # already registered in this session
        if "already" not in str(exc).lower():
            raise
