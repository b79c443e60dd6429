"""One-off sf1 scale probe for the two heaviest registry plans
(round-11 verdict ask #8): measure graph_triangles and
dedup_embedding_lsh at sf0.1 and at a synthetic sf1 (10x rows) and
report the wall-time ratio. Linear-ish growth (ratio ~= 10) pins the
orientation bound / LSH bucket bound holding at scale; quadratic
growth would read ~100.

The sf1 inputs derive from sf0.1 by replication that PRESERVES the
per-replica structure while keeping replicas disjoint:

- lineitem: 10 copies with l_orderkey/l_partkey offset per replica ->
  10 disjoint copies of the co-order part graph (|E|, triangles, and
  wedge work all scale exactly 10x, so the measured ratio isolates the
  engine's scaling, not a change in graph shape);
- embeddings: 10 copies with vec_id offset and the 64-dim vector
  cyclically ROTATED by replica index — rotation preserves intra-replica
  cosine geometry exactly (same near-dup structure per replica) while
  cross-replica cosines fall back to the background distribution, so
  true pairs scale ~10x.

Writes nothing under /root/testdata; the derived tables land in /tmp.

Usage: python tools/scaleprobe.py  -> one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_example_spark import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10


def build_sf1(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    o_span = 1 << 21  # > max l_orderkey
    p_span = 1 << 16  # > max l_partkey
    reps = None
    for i in range(REPLICAS):
        r = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * o_span)).withColumn(
            "l_partkey", F.col("l_partkey") + F.lit(i * p_span)
        )
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n_span = 1 << 16
    reps = None
    for i in range(REPLICAS):
        rot = F.expr(
            f"concat(slice(embedding, {i % 64 + 1}, {64 - (i % 64)}),"
            f" slice(embedding, 1, {i % 64}))"
        ) if i % 64 else F.col("embedding")
        r = emb.select(
            (F.col("vec_id") + F.lit(i * n_span)).alias("vec_id"),
            rot.alias("embedding"),
            "label",
        )
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def main() -> None:
    from etl_pipeline_example_spark.operators.similarity import (
        dedup_embedding_lsh,
    )
    from etl_pipeline_example_spark.plans.graph import graph_triangles

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf1_dir = "/tmp/scaleprobe_sf1"
    build_sf1(spark, sf1_dir)

    ops = {
        "graph_triangles": graph_triangles,
        "dedup_embedding_lsh": dedup_embedding_lsh,
    }
    out = {}
    for name, fn in ops.items():
        fn(spark, SF01).count()  # warm: page cache, codegen, workers
        rows = {}
        times = {}
        for label, d in [("sf0.1", SF01), ("sf1", sf1_dir)]:
            t0 = time.perf_counter()
            rows[label] = fn(spark, d).count()
            times[label] = round(time.perf_counter() - t0, 2)
        out[name] = {
            "t_sf0.1_s": times["sf0.1"],
            "t_sf1_s": times["sf1"],
            "ratio": round(times["sf1"] / times["sf0.1"], 2),
            "rows_sf0.1": rows["sf0.1"],
            "rows_sf1": rows["sf1"],
            # for output-bound pair finders the honest linearity metric
            # is throughput per RESULT row, not wall-ratio (the result
            # set itself may grow superlinearly with corpus density)
            "rows_per_sec_sf0.1": round(rows["sf0.1"] / times["sf0.1"], 1),
            "rows_per_sec_sf1": round(rows["sf1"] / times["sf1"], 1),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
