"""Exact weighted median per group: the order statistic SQL lacks.

``percentile`` gives the unweighted median; the weighted median —
"the price at which half the QUANTITY sits below" — is the robust
per-supplier price point a procurement dashboard wants (a supplier
shipping 1000 cheap units and 1 gold-plated one has a weighted median
at the cheap end, where the plain median of line items may not be).

No engine has a weighted-median aggregate, but the definition is one
window pass: order each group by price (unique (orderkey, linenumber)
tiebreak = total order), accumulate weight, and the weighted median is
the FIRST price where the running weight reaches half the group total.
``2*cum >= tot`` in integer-free DECIMAL arithmetic — the running and
total sums both accumulate decimal(18,2), because double accumulation
is evaluation-order-dependent (DuckDB's windowed sums use segment
trees — a different addition tree than Spark's running frame — so
float cums WOULD diverge; decimal sums associate).

Scale: the window partitions by ``l_suppkey`` — per-supplier line
count is a constant of the schema (~600 at every TPC-H SF), so
partitions stay bounded as the table grows; the shuffle is one hash
exchange on suppkey, and the post-filter min-by is a map-side-combined
groupBy. No global window anywhere.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_example_spark.sources.readers import read_table


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_suppkey, total_qty, wmedian_price): per-supplier
    quantity-weighted median of l_extendedprice."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.expr("cast(l_quantity as decimal(18,2))").alias("qty"),
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("price").asc(), F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    wtot = Window.partitionBy("l_suppkey")
    cum = li.select(
        "l_suppkey",
        "price",
        F.sum("qty").over(w).alias("cum"),
        F.sum("qty").over(wtot).alias("tot"),
    )
    return (
        cum.filter(F.expr("cum * 2 >= tot"))
        .groupBy("l_suppkey")
        .agg(
            F.expr("cast(min(tot) as double)").alias("total_qty"),
            F.min("price").alias("wmedian_price"),
        )
        .orderBy("l_suppkey")
    )


Q_WEIGHTED_MEDIAN_SQL = """
WITH cum AS (
  SELECT l_suppkey, l_extendedprice AS price,
         sum(cast(l_quantity AS decimal(18,2))) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
         ) AS cum,
         sum(cast(l_quantity AS decimal(18,2))) OVER (
           PARTITION BY l_suppkey
         ) AS tot
  FROM lineitem
)
SELECT l_suppkey, cast(min(tot) AS double) AS total_qty,
       min(price) AS wmedian_price
FROM cum
WHERE cum * 2 >= tot
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


WMEDIAN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_weighted_median": q_weighted_median,
}

WMEDIAN_ORACLES: dict[str, str] = {
    "q_weighted_median": Q_WEIGHTED_MEDIAN_SQL,
}
