"""Subset bench with bench.py's exact methodology (same session factory,
same warmup, sorted order, best-of-2 via count()) so per-query numbers
are comparable to the full bench's. Usage:

    python tools/minibench.py key1 key2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_example_spark import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys = sys.argv[1:]
    spark = get_spark("etl-pipeline-example-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for t in ["lineitem", "orders", "customer", "events", "documents", "embeddings"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    timings: dict[str, float] = {}
    for rnd in range(2):
        for name in sorted(keys):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            print(f"# r{rnd} {name}: {dt}s", file=sys.stderr)
        spark.catalog.clearCache()
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
