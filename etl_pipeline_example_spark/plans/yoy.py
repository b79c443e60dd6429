"""Year-over-year growth: revenue by (nation, year) with prior-year
comparison.

The board-deck query: annual revenue per customer nation, each year
set against the same nation's prior year (``lag`` within the nation
partition) with the absolute delta and the growth ratio. Nations with
no prior year report NULL delta/ratio (first observed year).

Exactness: revenue accumulates in decimal(18,2) (associative, exact);
``yoy_ratio`` is one double division of two exactly-representable
decimal renderings — correctly-rounded IEEE, bit-exact cross-engine.

Scale: one groupBy (nation, year) over the orders⋈customer⋈nation
join — nation (fixed 25 rows) carries the only forced broadcast,
customer scales with SF so its join stays AQE-decided; the window runs over ≤ years-per-nation
rows (bounded dimension, never fact-sized partitions).

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


def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_name, order_year, revenue, prev_revenue, yoy_delta,
    yoy_ratio): annual national revenue vs the prior year."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    annual = (
        # nation (fixed 25 rows) carries the only forced broadcast;
        # customer SCALES with SF, so its join stays AQE-decided — a
        # forced hint would override runtime stats at 100 TB
        orders.join(
            cust.join(
                F.broadcast(nation),
                cust["c_nationkey"] == nation["n_nationkey"],
            ).select("c_custkey", "n_name"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            "n_name",
            # bigint to match the oracle's extract(year) rendering
            F.expr("cast(year(o_orderdate) as bigint)").alias("order_year"),
        )
        .agg(
            F.expr("sum(cast(o_totalprice as decimal(18,2)))").alias("rev")
        )
    )
    w = Window.partitionBy("n_name").orderBy("order_year")
    return (
        annual.withColumn("prev_rev", F.lag("rev").over(w))
        .select(
            "n_name",
            "order_year",
            F.expr("cast(rev as double)").alias("revenue"),
            F.expr("cast(prev_rev as double)").alias("prev_revenue"),
            F.expr("cast(rev - prev_rev as double)").alias("yoy_delta"),
            F.expr(
                "cast(rev as double) / cast(prev_rev as double)"
            ).alias("yoy_ratio"),
        )
        .orderBy("n_name", "order_year")
    )


Q_YOY_GROWTH_SQL = """
WITH annual AS (
  SELECT n.n_name, extract(year FROM o.o_orderdate) AS order_year,
         sum(cast(o.o_totalprice AS decimal(18,2))) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
laged AS (
  SELECT n_name, order_year, rev,
         lag(rev) OVER (PARTITION BY n_name ORDER BY order_year)
           AS prev_rev
  FROM annual
)
SELECT n_name, cast(order_year AS bigint) AS order_year,
       cast(rev AS double) AS revenue,
       cast(prev_rev AS double) AS prev_revenue,
       cast(rev - prev_rev AS double) AS yoy_delta,
       cast(rev AS double) / cast(prev_rev AS double) AS yoy_ratio
FROM laged
ORDER BY n_name, order_year
"""


YOY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_yoy_growth": q_yoy_growth,
}

YOY_ORACLES: dict[str, str] = {
    "q_yoy_growth": Q_YOY_GROWTH_SQL,
}
