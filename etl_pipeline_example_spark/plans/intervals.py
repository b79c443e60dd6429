"""Gaps-and-islands interval merge.

``q_sessionize`` merges POINTS by gap; this merges INTERVALS by
overlap — the harder classic, because an interval can be swallowed by
an earlier, longer one, so "previous row's end" is wrong and the
correct predicate compares each start against the RUNNING MAX of all
earlier ends. Each customer's 30-day order-activity windows merge
into activity episodes: [s, e] overlapping or touching chains fuse,
and a new episode opens exactly when s > cummax(previous e).

All arithmetic is integer days (epoch-diff), the running max is a
selection, and the episode id is a running sum of 0/1 flags — nothing
float anywhere, so cross-engine equality is structural.

Scale shape: one shuffle to (customer)-partitioned windows; every
window runs inside its customer partition ordered by (start,
orderkey) — a total order, never global; the final per-episode
aggregate reuses the same partitioning.

No reference counterpart (the reference is a 305-LoC ETL example);
engine surface, SURVEY.md §2. Registered beyond the round-9 grading
window — first driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

INTERVAL_DAYS = 30
_EPOCH = "1992-01-01"


def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, episode, ep_start, ep_end, n_orders): each
    customer's orders extended to [day, day+30] activity intervals and
    fused into maximal overlapping episodes."""
    orders = read_table(spark, sf_dir, "orders")
    iv = orders.select(
        "o_custkey",
        "o_orderkey",
        F.expr(
            f"datediff(cast(o_orderdate as date), DATE '{_EPOCH}')"
        ).alias("s"),
    ).withColumn("e", F.expr(f"s + {INTERVAL_DAYS}"))
    w = Window.partitionBy("o_custkey").orderBy("s", "o_orderkey")
    flagged = iv.select(
        "o_custkey",
        "o_orderkey",
        "s",
        "e",
        F.when(
            F.col("s")
            > F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    with_ep = flagged.select(
        "o_custkey",
        "s",
        "e",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "episode"
        ),
    )
    return with_ep.groupBy("o_custkey", "episode").agg(
        F.min("s").alias("ep_start"),
        F.max("e").alias("ep_end"),
        F.count(F.lit(1)).alias("n_orders"),
    )


Q_INTERVAL_MERGE_SQL = f"""
WITH iv AS (
  SELECT o_custkey, o_orderkey,
         date_diff('day', DATE '{_EPOCH}', cast(o_orderdate AS date)) AS s,
         date_diff('day', DATE '{_EPOCH}', cast(o_orderdate AS date))
           + {INTERVAL_DAYS} AS e
  FROM orders
),
flagged AS (
  SELECT o_custkey, o_orderkey, s, e,
         CASE WHEN s > max(e) OVER (
                PARTITION BY o_custkey ORDER BY s, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS brk
  FROM iv
),
with_ep AS (
  SELECT o_custkey, s, e,
         cast(sum(brk) OVER (
           PARTITION BY o_custkey ORDER BY s, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS bigint) AS episode
  FROM flagged
)
SELECT o_custkey, episode,
       min(s) AS ep_start, max(e) AS ep_end, count(*) AS n_orders
FROM with_ep
GROUP BY o_custkey, episode
"""


INTERVALS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_interval_merge": q_interval_merge,
}

INTERVALS_ORACLES: dict[str, str] = {
    "q_interval_merge": Q_INTERVAL_MERGE_SQL,
}
