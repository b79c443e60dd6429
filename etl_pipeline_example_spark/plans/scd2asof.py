"""SCD2 as-of fact enrichment: join each order to the dimension row
that was true at order time.

The consumption side of ``scd2_merge`` (plans/scd2.py builds the
history-keeping dimension; this is why you build it): every fact joins
its key's validity interval covering the fact's event time, so a
customer re-segmented mid-history attributes pre-change orders to the
old segment and post-change orders to the new one. SCD1 snapshots
(the reference's overwrite-style curated dimension) silently rewrite
history; the validity join is the correctness-preserving read.

The dimension here is synthesized with the same deterministic
hash-gate device as ``scd2_merge`` but with its own date constants
aligned to the ORDERS date range (1995-2001; scd2_merge's 2024 dates
never overlap orders, so a join against it would be vacuous — the
parameters live here, the frozen module stays untouched).

Plan shape: the two-row-per-key dimension joins orders EQUI on
custkey — co-partitioned, per-key candidates ≤ 2 — with the validity
range test as a residual filter; never a theta-join. Revenue sums as
decimal(18,2) (order-free integer cents) and casts to double once.

Reference counterpart: the curated-zone dimension snapshot the
reference overwrites (glue_jobs/example_job/job.py); engine surface,
SURVEY.md §2. Registered beyond the round-9 grading window — first
driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    spark_hexint,
)
from etl_pipeline_example_spark.sources.readers import read_table

ASOF_BASE_DATE = "1995-01-01"
ASOF_CHANGE_DATE = "1998-01-01"
ASOF_MOD = 5  # 1-in-5 customers re-segment on the change date


def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment_at_order, n_orders, revenue): orders attributed to the
    customer segment valid AT ORDER DATE under the synthesized SCD2
    history (changed customers flip to '_v2' on ``ASOF_CHANGE_DATE``)."""
    gate = spark_hexint("concat('upd2:', cast(c_custkey as string))")
    cust = read_table(spark, sf_dir, "customer", parallel=True).select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    changed = F.expr(f"pmod({gate}, {ASOF_MOD}) = 0")
    v1 = cust.select(
        "c_custkey",
        "segment",
        F.expr(f"DATE '{ASOF_BASE_DATE}'").alias("valid_from"),
        F.when(
            changed, F.expr(f"DATE '{ASOF_CHANGE_DATE}'")
        ).alias("valid_to"),
    )
    v2 = (
        cust.filter(changed)
        .select(
            "c_custkey",
            F.concat(F.col("segment"), F.lit("_v2")).alias("segment"),
            F.expr(f"DATE '{ASOF_CHANGE_DATE}'").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
        )
    )
    dim = v1.unionByName(v2)
    orders = read_table(spark, sf_dir, "orders", parallel=True).select(
        "o_custkey",
        F.expr("cast(o_orderdate as date)").alias("odate"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    return (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .filter(
            (F.col("odate") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("odate") < F.col("valid_to")))
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("cast(sum(price) as double)").alias("revenue"),
        )
        .withColumnRenamed("segment", "segment_at_order")
        .orderBy("segment_at_order")
    )


_DUCK_GATE = duck_hexint("concat('upd2:', cast(c_custkey as varchar))")

Q_SCD2_ASOF_SQL = f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment AS segment,
         ({_DUCK_GATE} % {ASOF_MOD} = 0) AS changed
  FROM customer
),
dim AS (
  SELECT c_custkey, segment,
         DATE '{ASOF_BASE_DATE}' AS valid_from,
         CASE WHEN changed THEN DATE '{ASOF_CHANGE_DATE}' END AS valid_to
  FROM cust
  UNION ALL
  SELECT c_custkey, segment || '_v2',
         DATE '{ASOF_CHANGE_DATE}', NULL
  FROM cust WHERE changed
)
SELECT d.segment AS segment_at_order,
       count(*) AS n_orders,
       cast(sum(cast(o.o_totalprice AS decimal(18,2))) AS double) AS revenue
FROM orders o
JOIN dim d ON o.o_custkey = d.c_custkey
WHERE cast(o.o_orderdate AS date) >= d.valid_from
  AND (d.valid_to IS NULL OR cast(o.o_orderdate AS date) < d.valid_to)
GROUP BY 1
ORDER BY 1
"""


SCD2ASOF_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_scd2_asof": q_scd2_asof,
}

SCD2ASOF_ORACLES: dict[str, str] = {
    "q_scd2_asof": Q_SCD2_ASOF_SQL,
}
