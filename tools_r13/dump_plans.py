#!/usr/bin/env python
"""Dump explain("formatted") for named queries to plans/r13/<q>_<tag>.txt.

Usage: python tools_r13/dump_plans.py <tag> <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dieter___etl___monarchmoney_spark import registry  # noqa: E402
from dieter___etl___monarchmoney_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry.load()
    out = REPO / "plans" / "r13"
    out.mkdir(parents=True, exist_ok=True)
    for n in names:
        df = queries[n](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{n}_{tag}.txt").write_text(txt)
        print(f"wrote {n}_{tag}.txt ({txt.count('Exchange')} Exchange-ish lines)")


if __name__ == "__main__":
    main()
