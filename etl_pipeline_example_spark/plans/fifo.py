"""FIFO allocation: match demand against supply lots in arrival order.

The classic hard-in-SQL inventory/finance primitive (FIFO costing, lot
consumption, payment-to-invoice matching): given per-key demand and a
time-ordered sequence of supply lots, how much of each lot is consumed?
The imperative loop ("walk the lots, subtract until demand is gone")
becomes one window cumsum plus clamped interval arithmetic:

    take_i = clamp(demand − cum_before_i, 0, qty_i)
           = greatest(0, least(qty_i, demand − (cum_i − qty_i)))

Concretely here: per part, demand = total RETURNED quantity
(l_returnflag = 'R'); lots = the non-returned lineitems in
(l_shipdate, l_orderkey, l_linenumber) order. The census reports, per
part, the lots touched and quantity covered plus the unfilled
remainder — every number integer (quantities are integral; cast long),
so cross-engine equality is arithmetic-free.

Scale shape: demand is a map-side-combined aggregate broadcast back by
key join; the cumsum window partitions by l_partkey (bounded by lots
per part); the census is a second map-side-combined aggregate. Nothing
global, nothing collected.

No reference counterpart (305-LoC Glue ETL); engine surface, SURVEY.md
§2. Registered beyond the round-12 grading window — first driver slot
round 13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_fifo_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_partkey, demand_qty, supply_qty, n_lots_used, qty_covered,
    qty_unfilled): FIFO consumption of supply lots by returned-quantity
    demand, per part."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    demand = li.filter(F.col("l_returnflag") == "R").groupBy(
        "l_partkey"
    ).agg(F.sum("qty").alias("demand_qty"))
    lots = li.filter(F.col("l_returnflag") != "R")
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    cum = lots.withColumn("cum", F.sum("qty").over(w))
    taken = cum.join(demand, "l_partkey", "inner").select(
        "l_partkey",
        "qty",
        "demand_qty",
        F.expr(
            "greatest(CAST(0 AS BIGINT),"
            " least(qty, demand_qty - (cum - qty)))"
        ).alias("take"),
    )
    return (
        taken.groupBy("l_partkey", "demand_qty")
        .agg(
            F.sum("qty").alias("supply_qty"),
            F.sum(F.expr("CASE WHEN take > 0 THEN 1 ELSE 0 END")).alias(
                "n_lots_used"
            ),
            F.sum("take").alias("qty_covered"),
        )
        .select(
            "l_partkey",
            "demand_qty",
            "supply_qty",
            "n_lots_used",
            "qty_covered",
            F.expr(
                "greatest(CAST(0 AS BIGINT), demand_qty - supply_qty)"
            ).alias("qty_unfilled"),
        )
    )


Q_FIFO_COVER_SQL = """
WITH li AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate, l_returnflag,
         cast(l_quantity AS bigint) AS qty
  FROM lineitem
),
demand AS (
  SELECT l_partkey, cast(sum(qty) AS bigint) AS demand_qty
  FROM li WHERE l_returnflag = 'R' GROUP BY 1
),
cum AS (
  SELECT l_partkey, qty,
         cast(sum(qty) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
         ) AS bigint) AS cum
  FROM li WHERE l_returnflag <> 'R'
),
taken AS (
  SELECT c.l_partkey, c.qty, d.demand_qty,
         greatest(CAST(0 AS BIGINT),
                  least(c.qty, d.demand_qty - (c.cum - c.qty))) AS take
  FROM cum c JOIN demand d ON d.l_partkey = c.l_partkey
)
SELECT l_partkey, demand_qty,
       cast(sum(qty) AS bigint) AS supply_qty,
       cast(sum(CASE WHEN take > 0 THEN 1 ELSE 0 END) AS bigint)
         AS n_lots_used,
       cast(sum(take) AS bigint) AS qty_covered,
       greatest(CAST(0 AS BIGINT),
                demand_qty - cast(sum(qty) AS bigint)) AS qty_unfilled
FROM taken
GROUP BY l_partkey, demand_qty
"""


FIFO_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_fifo_cover": q_fifo_cover,
}

FIFO_ORACLES: dict[str, str] = {
    "q_fifo_cover": Q_FIFO_COVER_SQL,
}
