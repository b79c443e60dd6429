"""Dump .explain('formatted') for registered queries to files.

Usage: python tools/dumpplan.py SUFFIX key1 [key2 ...]
Writes plans/r18/<key>_<SUFFIX>.txt on the bench session.
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_example_spark import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    os.makedirs("plans/r18", exist_ok=True)
    for k in keys:
        df = queries[k](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"plans/r18/{k}_{suffix}.txt", "w") as f:
            f.write(plan)
        print(f"wrote plans/r18/{k}_{suffix}.txt")


if __name__ == "__main__":
    main()
