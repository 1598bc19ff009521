"""Driver-faithful session regression tests (VERDICT r9 #2).

Every other test runs on the ``get_spark()`` fixture, whose session
force-enables package confs such as
``spark.sql.python.filterPushdown.enabled`` (session.py). The grading
driver runs on a session this package did NOT build — upstream Spark
defaults — and round 9 proved the suite was structurally blind to that
difference: ``paged_source_roundtrip`` opted into the pushdown reader
unconditionally and Spark hard-failed it with
``DATA_SOURCE_PUSHDOWN_DISABLED`` on the driver's vanilla session,
six rounds after the pushdown lane was added.

Two lanes close the gap:

1. an in-process test that flips the runtime SQL confs the package
   session sets back to upstream defaults and runs the connector-backed
   registry queries — fast, exercises the exact plan-time rejection
   class on every ``pytest`` run;
2. a subprocess test that builds a genuinely bare
   ``SparkSession.builder.master("local[2]")`` session (fresh JVM, no
   package confs, no inherited PYTHONPATH tricks) and runs every
   connector-backed registry query plus the flagship ``entry()`` path —
   the faithful replica of the driver harness.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SF_SMOKE = "/root/testdata/sf0.001"

#: every registry query whose plan crosses a custom-connector edge —
#: the surface where a foreign session's conf divergence can reject the
#: plan outright (Python data source readers/writers, streaming sinks).
CONNECTOR_QUERIES = (
    "paged_source_roundtrip",
    "paged_sink_roundtrip",
    "graphql_source_roundtrip",
    "streaming_sink_roundtrip",
)

#: runtime SQL confs get_spark() sets that a vanilla session would not
#: have; value = the upstream default we emulate. Static confs (driver
#: memory, UI) can't differ at plan time, so flipping these reproduces
#: the driver-session planning environment in-process.
_FOREIGN_CONF = {
    "spark.sql.python.filterPushdown.enabled": "false",
    "spark.sql.adaptive.enabled": "true",  # upstream default since 3.2
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
}


def test_connector_queries_on_foreign_conf_session(spark):
    """Flip the package confs to upstream defaults on the live session
    and run every connector-backed query: a plan-time conf rejection
    (the r9 DATA_SOURCE_PUSHDOWN_DISABLED class) fails here on every
    pytest run instead of six rounds later on the driver."""
    from dieter___etl___monarchmoney_spark import registry

    queries, _ = registry.load()
    saved = {}
    for k, v in _FOREIGN_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        for name in CONNECTOR_QUERIES:
            n = queries[name](spark, SF_SMOKE).count()
            assert n > 0, f"{name} returned no rows on a foreign-conf session"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


_BARE_SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# deliberately NOT get_spark(): upstream defaults only, like the driver
spark = (
    SparkSession.builder.appName("bare-driver-replica")
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as e

out = {{}}
out["entry"] = e.entry(spark).count()
qs = e.queries()
for name in {names!r}:
    out[name] = qs[name](spark, {sf!r}).count()
spark.stop()
print("RESULT:" + json.dumps(out))
"""


def test_connector_queries_on_bare_subprocess_session(tmp_path):
    """The faithful replica: a fresh interpreter + fresh JVM builds a
    bare SparkSession (no package confs at all) and runs the flagship
    ``entry()`` plus every connector-backed query, exactly as the
    grading driver does. Catches any dependency on get_spark()-only
    state: runtime confs, PYTHONPATH exports, registered sources.

    cwd is a NEUTRAL temp dir, not the repo: with cwd=repo the Python
    workers can import the package via '' on sys.path and the test
    cannot see a broken by-value shipping contract — exactly how the
    standalone-vs-vendored cloudpickle registration no-op stayed
    invisible (sources/paged_source.register docstring). From a
    neutral cwd the connector classes MUST arrive by value."""
    script = _BARE_SCRIPT.format(
        repo=str(REPO), names=list(CONNECTOR_QUERIES), sf=SF_SMOKE
    )
    env = dict(os.environ)
    # scrub the harness escape hatches so the subprocess is as close to
    # the driver's environment as this box allows
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, (
        f"bare-session run failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, f"no RESULT line in stdout:\n{proc.stdout[-2000:]}"
    counts = json.loads(line[-1][len("RESULT:"):])
    assert counts["entry"] >= 0
    for name in CONNECTOR_QUERIES:
        assert counts[name] > 0, f"{name} empty on bare session: {counts}"


_SHIP_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ.pop("PYTHONPATH", None)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("bare-ship-package")
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from dieter___etl___monarchmoney_spark import ship_package
from dieter___etl___monarchmoney_spark import registry

ship_package(spark)
qs, _ = registry.load()
# an Arrow-UDF lane: its closure pickles BY REFERENCE, so this count
# only succeeds if the workers can import the package from the zip
n = qs["arrow_udf_text_normalize"](spark, {sf!r}).count()
spark.stop()
print("RESULT:" + json.dumps({{"arrow_udf_text_normalize": n}}))
"""


def test_ship_package_enables_udf_lanes_on_bare_session(tmp_path):
    """ship_package() must make the Arrow/Pandas-UDF lanes (by-REFERENCE
    closures) work on a session whose workers can't otherwise import
    the package: bare session, neutral cwd, no PYTHONPATH — the exact
    setup where the full-registry replay failed every UDF query with
    worker-side ModuleNotFoundError before the helper existed."""
    script = _SHIP_SCRIPT.format(repo=str(REPO), sf=SF_SMOKE)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, (
        f"ship_package bare run failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    counts = json.loads(line[-1][len("RESULT:"):])
    assert counts["arrow_udf_text_normalize"] > 0


def test_ship_package_zip_layout_and_idempotency(spark):
    """The shipped zip must root at the package dir (workers prepend
    the zip to sys.path, so `import dieter___etl___monarchmoney_spark`
    resolves only if arcnames start with the package name), include
    every .py, and re-shipping must be a same-name no-op Spark
    tolerates."""
    import zipfile

    from dieter___etl___monarchmoney_spark import ship_package

    path1 = ship_package(spark)
    path2 = ship_package(spark)  # idempotent per session
    assert path1 == path2
    with zipfile.ZipFile(path1) as zf:
        names = zf.namelist()
    pkg = "dieter___etl___monarchmoney_spark/"
    assert all(n.startswith(pkg) for n in names), names[:5]
    assert f"{pkg}__init__.py" in names
    assert f"{pkg}session.py" in names
    assert f"{pkg}sources/paged_source.py" in names
    src_count = sum(
        1 for _ in (REPO / "dieter___etl___monarchmoney_spark").rglob("*.py")
    )
    assert len(names) == src_count
