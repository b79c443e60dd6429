"""Per-customer maximum drawdown: running-max ratio analytics.

The finance-shaped window readout (peak-to-trough decline) applied to
order values: for each customer's orders in date order, how far below
their running-peak order value did they fall — the "shrinking basket"
signal a retention model feeds on. max_drawdown = min over the
sequence of (current / running peak); 1.0 means never below peak.

Exactness: running max is pure comparison (no accumulation error);
the ratio is one double division per row; the final min is again pure
comparison — every number is exact in both engines. The (date,
orderkey) compound order pins a total order so the running peak is
deterministic under ties.

Scale: ONE hash exchange on custkey; per-customer partitions are
schema-bounded (~10 orders per customer at every TPC-H SF), so the
window never concentrates; the final rollup is map-side combined.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, n_orders, max_drawdown): smallest ratio of an
    order's value to the customer's running peak, date order."""
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    ratios = orders.select(
        "c_custkey",
        F.expr("o_totalprice").alias("v"),
        F.max("o_totalprice").over(w).alias("peak"),
    )
    return (
        ratios.groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("min(v / peak)").alias("max_drawdown"),
        )
        .orderBy("c_custkey")
    )


Q_MAX_DRAWDOWN_SQL = """
WITH ratios AS (
  SELECT o_custkey AS c_custkey, o_totalprice AS v,
         max(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS peak
  FROM orders
)
SELECT c_custkey, count(*) AS n_orders,
       min(v / peak) AS max_drawdown
FROM ratios
GROUP BY c_custkey
ORDER BY c_custkey
"""


DRAWDOWN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_max_drawdown": q_max_drawdown,
}

DRAWDOWN_ORACLES: dict[str, str] = {
    "q_max_drawdown": Q_MAX_DRAWDOWN_SQL,
}
