"""Sequence-gap audit: is a "dense" id column actually dense?

Upstream systems promise gapless sequences (invoice numbers, ledger
ids, event offsets); silent gaps mean lost data, duplicates mean
replays. The audit reports both — total missing count, gap COUNT and
the LONGEST gap run, plus duplicate rows — all exact integers.

The scale problem is that gap structure needs neighbor ordering, and a
single ``lag`` over the whole column is a global sort. Two-level
decomposition (the equi-depth prefix-sum discipline): ids chunk by
``id DIV 4096``; within-chunk neighbor gaps ride a window PARTITIONED
by chunk, and cross-chunk gaps come from a chunk-level lag over the
(chunk, min, max) summary — a frame bounded by |id range|/4096, never
by rows. Empty chunks between present ones fold into the boundary gap
arithmetic automatically (the chunk-level lag skips them, and the gap
length is pure subtraction).

Oracle: ONE lead over the ordered distinct ids — the naive form that's
fine at oracle scale — so the decomposition is certified against the
direct definition, not against itself.

No reference counterpart (the reference's test_data.py checks row
counts only); DQ surface, SURVEY.md §2. Registered beyond the
round-12 grading window — first driver slot round 13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

CHUNK = 4096


def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lo, hi, n_rows, n_distinct, n_dup_rows, n_missing, n_gaps,
    max_gap_len): density audit of orders.o_orderkey."""
    dp = spark.sparkContext.defaultParallelism
    ids = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id")
    )
    distinct = (
        ids.withColumn("chunk", F.expr(f"id DIV {CHUNK}"))
        .repartition(dp, "chunk")
        .groupBy("chunk", "id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # within-chunk neighbor gaps (window bounded by the chunk)
    w_in = Window.partitionBy("chunk").orderBy("id")
    inner = distinct.select(
        "chunk",
        "id",
        "n",
        (F.lead("id").over(w_in) - F.col("id") - 1).alias("gap_len"),
    )
    inner_gaps = inner.filter(F.col("gap_len") > 0).agg(
        F.count(F.lit(1)).alias("g"), F.max("gap_len").alias("m")
    )
    # cross-chunk gaps from the bounded chunk summary
    summary = distinct.groupBy("chunk").agg(
        F.min("id").alias("c_lo"), F.max("id").alias("c_hi")
    )
    w_ch = Window.orderBy("chunk")
    boundary = summary.select(
        (F.lead("c_lo").over(w_ch) - F.col("c_hi") - 1).alias("gap_len")
    )
    boundary_gaps = boundary.filter(F.col("gap_len") > 0).agg(
        F.count(F.lit(1)).alias("g"), F.max("gap_len").alias("m")
    )
    totals = distinct.agg(
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    return (
        totals.crossJoin(F.broadcast(inner_gaps.selectExpr(
            "coalesce(g, 0) AS g1", "coalesce(m, 0) AS m1"
        )))
        .crossJoin(F.broadcast(boundary_gaps.selectExpr(
            "coalesce(g, 0) AS g2", "coalesce(m, 0) AS m2"
        )))
        .selectExpr(
            "lo",
            "hi",
            "n_rows",
            "n_distinct",
            "CAST(n_rows - n_distinct AS BIGINT) AS n_dup_rows",
            "CAST(hi - lo + 1 - n_distinct AS BIGINT) AS n_missing",
            "CAST(g1 + g2 AS BIGINT) AS n_gaps",
            "CAST(greatest(m1, m2) AS BIGINT) AS max_gap_len",
        )
    )


DQ_SEQUENCE_GAPS_SQL = """
WITH distinct_ids AS (
  SELECT o_orderkey AS id, count(*) AS n FROM orders GROUP BY 1
),
neighbored AS (
  SELECT id, n, lead(id) OVER (ORDER BY id) - id - 1 AS gap_len
  FROM distinct_ids
),
gaps AS (
  SELECT cast(coalesce(count(*) FILTER (WHERE gap_len > 0), 0) AS bigint)
           AS n_gaps,
         cast(coalesce(max(gap_len) FILTER (WHERE gap_len > 0), 0)
              AS bigint) AS max_gap_len
  FROM neighbored
),
totals AS (
  SELECT min(id) AS lo, max(id) AS hi,
         cast(sum(n) AS bigint) AS n_rows,
         count(*) AS n_distinct
  FROM distinct_ids
)
SELECT t.lo, t.hi, t.n_rows, t.n_distinct,
       cast(t.n_rows - t.n_distinct AS bigint) AS n_dup_rows,
       cast(t.hi - t.lo + 1 - t.n_distinct AS bigint) AS n_missing,
       g.n_gaps, g.max_gap_len
FROM totals t CROSS JOIN gaps g
"""


SEQGAPS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_sequence_gaps": dq_sequence_gaps,
}

SEQGAPS_ORACLES: dict[str, str] = {
    "dq_sequence_gaps": DQ_SEQUENCE_GAPS_SQL,
}
