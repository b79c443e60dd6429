"""Inter-order gap distribution: days between consecutive orders.

The reorder-cadence readout (inventory planning, churn modelling): for
every customer, the gap in days between each order and their previous
one (``lag`` over the per-customer date sequence), bucketed into a
fixed histogram. Customers' first orders contribute no gap.

Determinism: a customer can place several orders on one date, so the
lag ordering pins a total order with ``o_orderkey`` as tiebreak —
same-day consecutive orders contribute exact 0-day gaps identically in
both engines. All arithmetic is integer date subtraction.

Scale: ONE shuffle hashing on ``o_custkey`` feeds the per-customer
window (bounded partitions — orders per customer, never corpus-sized),
and the histogram is a map-side-combined count over ≤ 8 bucket rows.
No global window, no collect.

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-10 grading window — first
driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_example_spark.sources.readers import read_table

GAP_BUCKET = (
    "CASE WHEN gap_days = 0 THEN 'a_same_day'"
    " WHEN gap_days <= 7 THEN 'b_week'"
    " WHEN gap_days <= 30 THEN 'c_month'"
    " WHEN gap_days <= 90 THEN 'd_quarter'"
    " WHEN gap_days <= 365 THEN 'e_year'"
    " ELSE 'f_longer' END"
)


def q_order_gap_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(gap_bucket, n_gaps, n_customers): histogram of days between a
    customer's consecutive orders."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter("prev_date IS NOT NULL")
        .select(
            "o_custkey",
            F.expr(
                "datediff(cast(o_orderdate as date),"
                " cast(prev_date as date))"
            ).alias("gap_days"),
        )
    )
    return (
        gaps.select("o_custkey", F.expr(GAP_BUCKET).alias("gap_bucket"))
        .groupBy("gap_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("gap_bucket")
    )


Q_ORDER_GAP_DIST_SQL = f"""
WITH seq AS (
  SELECT o_custkey, o_orderdate,
         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey)
           AS prev_date
  FROM orders
),
gaps AS (
  SELECT o_custkey,
         datediff('day', cast(prev_date AS date),
                  cast(o_orderdate AS date)) AS gap_days
  FROM seq WHERE prev_date IS NOT NULL
)
SELECT {GAP_BUCKET} AS gap_bucket,
       count(*) AS n_gaps,
       cast(count(DISTINCT o_custkey) AS bigint) AS n_customers
FROM gaps
GROUP BY 1
ORDER BY 1
"""


ORDERGAP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_order_gap_dist": q_order_gap_dist,
}

ORDERGAP_ORACLES: dict[str, str] = {
    "q_order_gap_dist": Q_ORDER_GAP_DIST_SQL,
}
