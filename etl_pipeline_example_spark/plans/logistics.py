"""Logistics reporting: shipping-delay distributions and supplier
scorecards.

  li_shipping_lag     per-linestatus fulfilment performance: median
                      and p90 order→ship lag in days (integer date
                      diffs into exact percentiles, 6-dp pinned) and
                      the slow-ship rate (> SLOW_DAYS — Q4's lateness
                      predicate turned into a measure). The testdata
                      lineitem carries l_shipdate but not TPC-H's
                      commit/receipt dates, so lag anchors on the
                      order date (one orderkey-keyed fact-fact join,
                      the q3 shape).
  supplier_scorecard  the per-supplier composite a procurement report
                      leads with: revenue (exact decimal), lines
                      shipped, mean order→ship days, return rate —
                      one grouped pass over the joined facts, top-N
                      by revenue.

No reference counterpart (the reference is a 305-LoC ETL example);
general query-engine surface, SURVEY.md §2 rows 20z10–20z11.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

SCORECARD_TOP = 25


SLOW_DAYS = 60


def li_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_linestatus, n_lines, slow_rate, p50_lag_days, p90_lag_days):
    lag = ship − order date in days."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    return (
        li.join(orders, "l_orderkey")
        .select(
            "l_linestatus",
            F.expr("datediff(l_shipdate, o_orderdate)").alias("lag"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.expr(
                f"round(cast(sum(CASE WHEN lag > {SLOW_DAYS} THEN 1 ELSE 0 END) as double)"
                " / count(*), 6)"
            ).alias("slow_rate"),
            F.expr("round(percentile(lag, 0.5), 6)").alias("p50_lag_days"),
            F.expr("round(percentile(lag, 0.9), 6)").alias("p90_lag_days"),
        )
        .orderBy("l_linestatus")
    )


LI_SHIPPING_LAG_SQL = f"""
SELECT l_linestatus, count(*) AS n_lines,
       round(cast(sum(CASE WHEN lag > {SLOW_DAYS} THEN 1 ELSE 0 END) AS double)
             / count(*), 6) AS slow_rate,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY lag), 6)
         AS p50_lag_days,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY lag), 6)
         AS p90_lag_days
FROM (
  SELECT l.l_linestatus,
         date_diff('day', o.o_orderdate, cast(l.l_shipdate as date)) AS lag
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
GROUP BY 1 ORDER BY 1
"""


def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s_suppkey, s_name, revenue, n_lines, mean_ship_days, return_rate):
    top-``SCORECARD_TOP`` suppliers by revenue.

    Scale shape: one grouped pass over lineitem (map-side combined;
    revenue an exact decimal sum cast once), then a key join to the
    supplier dim — AQE decides the build side — and a
    TakeOrderedAndProject top-N.
    """
    li = read_table(spark, sf_dir, "lineitem")
    sup = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey"), F.col("s_name")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    per = (
        li.join(orders, "l_orderkey")
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.expr(
                "cast(sum(cast(l_extendedprice as decimal(18,2))"
                " * (1 - cast(l_discount as decimal(18,2)))) as double)"
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
            F.expr(
                "round(cast(sum(datediff(l_shipdate, o_orderdate)) as double)"
                " / count(*), 6)"
            ).alias("mean_ship_days"),
            F.expr(
                "round(cast(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
                " as double) / count(*), 6)"
            ).alias("return_rate"),
        )
    )
    return (
        per.join(sup, "s_suppkey")
        .select("s_suppkey", "s_name", "revenue", "n_lines", "mean_ship_days", "return_rate")
        .orderBy(F.col("revenue").desc(), F.col("s_suppkey").asc())
        .limit(SCORECARD_TOP)
    )


SUPPLIER_SCORECARD_SQL = f"""
WITH per AS (
  SELECT l.l_suppkey AS s_suppkey,
         cast(sum(cast(l.l_extendedprice AS decimal(18,2))
              * (1 - cast(l.l_discount AS decimal(18,2)))) AS double) AS revenue,
         count(*) AS n_lines,
         round(cast(sum(date_diff('day', o.o_orderdate,
                                  cast(l.l_shipdate as date))) AS double)
               / count(*), 6) AS mean_ship_days,
         round(cast(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS double) / count(*), 6) AS return_rate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
)
SELECT p.s_suppkey, s.s_name, p.revenue, p.n_lines, p.mean_ship_days,
       p.return_rate
FROM per p JOIN supplier s USING (s_suppkey)
ORDER BY revenue DESC, s_suppkey
LIMIT {SCORECARD_TOP}
"""


LOGISTICS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "li_shipping_lag": li_shipping_lag,
    "supplier_scorecard": supplier_scorecard,
}

LOGISTICS_ORACLES: dict[str, str] = {
    "li_shipping_lag": LI_SHIPPING_LAG_SQL,
    "supplier_scorecard": SUPPLIER_SCORECARD_SQL,
}
