"""Benchmark harness: run every headline query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a count() (forces full execution, keeps
the driver out of the result path). A warmup query absorbs JVM/session
startup so timings measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from etl_pipeline_example_spark import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("etl-pipeline-example-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    # Warmup: touch every table once so OS page cache and codegen are warm,
    # and spin up the Python worker pool so the first Pandas-UDF query
    # measures its plan, not worker fork+import time.
    for t in ["lineitem", "orders", "customer", "events", "documents", "embeddings"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    # Best-of-2: a second full pass absorbs environment noise (CPU
    # contention, GC) so the number reflects the plan, not the neighbour.
    timings: dict[str, float] = {}
    for rnd in range(2):
        for name in sorted(queries):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            print(f"# r{rnd} {name}: {dt}s", file=sys.stderr)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
