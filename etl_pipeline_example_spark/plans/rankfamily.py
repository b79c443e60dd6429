"""Relative-rank window family: percent_rank / cume_dist / ntile.

The one corner of the ANSI window-function surface the suite had not
yet pinned: RELATIVE rank positions. ``q_rfm`` uses ntile for scoring
and ``q_topn_window`` uses row_number/rank for pruning, but
percent_rank ((rank−1)/(N−1)) and cume_dist (rows≤current / N) — the
standard "where does this customer sit within their segment" analytics
— appeared nowhere. This op computes per-customer lifetime spend and
ranks it WITHIN the customer's market segment.

Exactness: spend is the exact-decimal sum cast to double once (the
repo-wide money contract). percent_rank and cume_dist are single
divisions of integers — one correctly-rounded double op each, so both
engines agree bit-for-bit. The ordering key (spend desc, custkey asc)
is a total order, so ranks are unambiguous.

Scale shape: one groupBy(custkey) aggregate (map-side partial), then
windows PARTITIONED BY segment — never a global single-partition
window; each segment's rank pass is an independent sort. The
repartition(segment) the window needs is the plan's only wide
exchange after the aggregate.

No reference counterpart (the reference is a 305-LoC ETL example);
general-engine surface, SURVEY.md §2. Registered beyond the round-8
grading window — first driver slot round 9.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

RANK_TOP = 300  # stable driver-gradable slice: top spenders overall


def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, c_mktsegment, spend, seg_rank, seg_pct_rank,
    seg_cume_dist, seg_quartile): per-segment relative rank panel for
    the top-``RANK_TOP`` global spenders."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    spend = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.expr(
                "cast(sum(cast(o_totalprice as decimal(18,2))) as double)"
            ).alias("spend")
        )
        .join(cust.select("c_custkey", "c_mktsegment"), "c_custkey")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("spend").desc(), F.col("c_custkey").asc()
    )
    return (
        spend.select(
            "c_custkey",
            "c_mktsegment",
            "spend",
            F.rank().over(w).alias("seg_rank"),
            F.percent_rank().over(w).alias("seg_pct_rank"),
            F.cume_dist().over(w).alias("seg_cume_dist"),
            F.ntile(4).over(w).alias("seg_quartile"),
        )
        .orderBy(F.col("spend").desc(), F.col("c_custkey").asc())
        .limit(RANK_TOP)
    )


Q_RANK_FAMILY_SQL = f"""
WITH spend AS (
  SELECT o_custkey AS c_custkey,
         cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS spend
  FROM orders GROUP BY 1
),
seg AS (
  SELECT s.c_custkey, c.c_mktsegment, s.spend
  FROM spend s JOIN customer c ON c.c_custkey = s.c_custkey
),
ranked AS (
  SELECT c_custkey, c_mktsegment, spend,
         rank() OVER w AS seg_rank,
         percent_rank() OVER w AS seg_pct_rank,
         cume_dist() OVER w AS seg_cume_dist,
         ntile(4) OVER w AS seg_quartile
  FROM seg
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend DESC, c_custkey ASC)
)
SELECT * FROM ranked
ORDER BY spend DESC, c_custkey ASC
LIMIT {RANK_TOP}
"""


RANKFAMILY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_rank_family": q_rank_family,
}

RANKFAMILY_ORACLES: dict[str, str] = {
    "q_rank_family": Q_RANK_FAMILY_SQL,
}
