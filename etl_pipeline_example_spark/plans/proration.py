"""Largest-remainder proration: exact integer allocation per order.

The billing/settlement primitive: split an order-level budget of
10,000 basis points across its line items proportionally to extended
price so the shares are integers and SUM EXACTLY to the budget.
Floating division can't do this (rounding drift leaves ±1 bp holes);
the largest-remainder (Hamilton) method can, in pure integer
arithmetic: base_i = ⌊B·w_i/W⌋, then the leftover B − Σbase goes to
the largest remainders (B·w_i mod W), ties broken by line number.
Weights are exact cents (round(price·100)), so no float enters the
allocation at all — the sample_allocation / mix_epochs apportionment
discipline applied per-group at fact-table scale.

Output is the per-basket-size census (n_items, n_orders, total_bps,
bps_min, bps_max, checksum): bounded by the max basket size (schema-
bounded small, SF-invariant), yet the
checksum Σ bps_i·l_linenumber pins every single allocation — swap one
basis point between two lines anywhere in the corpus and a cell
changes.

Scale: weights and order totals ride one map-side-combined groupBy on
the order key; the remainder rank is a window PARTITIONED BY order
(≤7 rows of state); the census is a second bounded aggregate. No
global sort, no driver round-trip, no floats summed.

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-13 grading window — first
driver slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

PRORATE_BPS = 10_000


def q_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_items, n_orders, total_bps, bps_min, bps_max, checksum):
    largest-remainder allocation of ``PRORATE_BPS`` across each
    order's lines by extended price, summarized per basket size."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("w"),
    )
    wtot = li.groupBy("l_orderkey").agg(
        F.sum("w").alias("wsum"), F.count(F.lit(1)).alias("n_items")
    )
    base = (
        li.join(wtot, "l_orderkey")
        .withColumn("base", F.expr(f"({PRORATE_BPS}L * w) div wsum"))
        .withColumn("rem", F.expr(f"({PRORATE_BPS}L * w) % wsum"))
    )
    w_ord = Window.partitionBy("l_orderkey")
    w_rnk = w_ord.orderBy(F.col("rem").desc(), F.col("l_linenumber").asc())
    alloc = (
        base.withColumn("short", F.lit(PRORATE_BPS) - F.sum("base").over(w_ord))
        .withColumn("rnk", F.row_number().over(w_rnk))
        .withColumn(
            "bps",
            F.col("base")
            + F.when(F.col("rnk") <= F.col("short"), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
    )
    per_order = alloc.groupBy("l_orderkey", "n_items").agg(
        F.sum("bps").alias("order_bps"),
        F.min("bps").alias("bps_min"),
        F.max("bps").alias("bps_max"),
        F.sum(F.col("bps") * F.col("l_linenumber")).alias("cksum"),
    )
    return (
        per_order.groupBy("n_items")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("order_bps").alias("total_bps"),
            F.min("bps_min").alias("bps_min"),
            F.max("bps_max").alias("bps_max"),
            F.sum("cksum").alias("checksum"),
        )
        .orderBy("n_items")
    )


Q_PRORATION_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         cast(round(l_extendedprice * 100) AS bigint) AS w
  FROM lineitem
),
wtot AS (
  SELECT l_orderkey, sum(w) AS wsum, count(*) AS n_items
  FROM li GROUP BY 1
),
base AS (
  SELECT li.l_orderkey, li.l_linenumber, wtot.n_items,
         ({PRORATE_BPS}::bigint * li.w) // wtot.wsum AS base,
         ({PRORATE_BPS}::bigint * li.w) % wtot.wsum AS rem
  FROM li JOIN wtot USING (l_orderkey)
),
alloc AS (
  SELECT l_orderkey, l_linenumber, n_items,
         base + CASE WHEN row_number() OVER (
                        PARTITION BY l_orderkey
                        ORDER BY rem DESC, l_linenumber)
                     <= {PRORATE_BPS} - sum(base) OVER (PARTITION BY l_orderkey)
                THEN 1 ELSE 0 END AS bps
  FROM base
),
per_order AS (
  SELECT l_orderkey, n_items, sum(bps) AS order_bps,
         min(bps) AS bps_min, max(bps) AS bps_max,
         sum(bps * l_linenumber) AS cksum
  FROM alloc GROUP BY 1, 2
)
SELECT n_items,
       count(*) AS n_orders,
       cast(sum(order_bps) AS bigint) AS total_bps,
       cast(min(bps_min) AS bigint) AS bps_min,
       cast(max(bps_max) AS bigint) AS bps_max,
       cast(sum(cksum) AS bigint) AS checksum
FROM per_order
GROUP BY n_items
ORDER BY n_items
"""


PRORATION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_proration": q_proration,
}

PRORATION_ORACLES: dict[str, str] = {
    "q_proration": Q_PRORATION_SQL,
}
