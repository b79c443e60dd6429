"""Market-basket co-occurrence and funnel step latency.

  q_basket_pairs  parts ordered together (the retail co-occurrence
                  mine): self-join lineitem on its order key, count
                  pairs, top-N. The scale note IS the operator: a
                  fact-fact self-join's pair space is Σ|basket|² —
                  bounded here because TPC-H orders hold ≤ 7 lines
                  (and real baskets are small), so the shuffle stays
                  linear-ish; a heavy-key basket would call for the
                  salting pattern q_skew_join demonstrates. Projection
                  is pruned to (orderkey, partkey) before the join so
                  the self-join carries two ints per row.
  q_funnel_lag    the latency companion to q_window_funnel: median
                  seconds from first view to first qualifying click,
                  and from that click to first qualifying purchase —
                  exact integer-second diffs into 6-dp-pinned exact
                  percentiles (the anomaly_mad discipline).

No reference counterpart (the reference is a 305-LoC ETL example);
general query-engine surface, SURVEY.md §2 rows 20z4–20z5.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.plans.behavior import (
    FUNNEL_STEPS,
    FUNNEL_WINDOW_HOURS,
)
from etl_pipeline_example_spark.sources.readers import read_table

BASKET_TOP = 20


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_a, part_b, n_orders): top-``BASKET_TOP`` part pairs
    co-occurring in an order, ordered pairs (part_a < part_b)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.expr("a.l_partkey < b.l_partkey"))
        .groupBy(
            F.expr("a.l_partkey").alias("part_a"),
            F.expr("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return pairs.orderBy(
        F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(BASKET_TOP)


Q_BASKET_PAIRS_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
FROM li a JOIN li b USING (l_orderkey)
WHERE a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT {BASKET_TOP}
"""


def q_funnel_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(leg, n_users, p50_seconds): median latency for view→click and
    click→purchase among users who completed each leg (the same
    within-window step semantics as q_window_funnel)."""
    s1, s2, s3 = FUNNEL_STEPS
    ev = read_table(spark, sf_dir, "events", parallel=True).select(
        "user_id", "event_type", "ts"
    )
    t1 = (
        ev.filter(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == s2)
        .join(t1, "user_id")
        .filter(
            F.expr(f"ts > t1 AND ts <= t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
        )
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == s3)
        .join(t2, "user_id")
        .filter(
            F.expr(f"ts > t2 AND ts <= t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
        )
        .groupBy("user_id", "t2")
        .agg(F.min("ts").alias("t3"))
    )
    leg1 = t2.select(
        F.lit(f"1_{s1}_to_{s2}").alias("leg"),
        F.expr("unix_timestamp(t2) - unix_timestamp(t1)").alias("lag_s"),
    )
    leg2 = t3.select(
        F.lit(f"2_{s2}_to_{s3}").alias("leg"),
        F.expr("unix_timestamp(t3) - unix_timestamp(t2)").alias("lag_s"),
    )
    return (
        leg1.unionByName(leg2)
        .groupBy("leg")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.expr("round(percentile(lag_s, 0.5), 6)").alias("p50_seconds"),
        )
    )


Q_FUNNEL_LAG_SQL = f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
),
t2 AS (
  SELECT e.user_id, t1.t1, min(e.ts) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}'
    AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY 1, 2
),
t3 AS (
  SELECT e.user_id, t2.t2, min(e.ts) AS t3
  FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}'
    AND e.ts > t2.t2 AND e.ts <= t2.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY 1, 2
),
legs AS (
  SELECT '1_{FUNNEL_STEPS[0]}_to_{FUNNEL_STEPS[1]}' AS leg,
         cast(floor(epoch(t2)) AS bigint) - cast(floor(epoch(t1)) AS bigint) AS lag_s FROM t2
  UNION ALL
  SELECT '2_{FUNNEL_STEPS[1]}_to_{FUNNEL_STEPS[2]}',
         cast(floor(epoch(t3)) AS bigint) - cast(floor(epoch(t2)) AS bigint) FROM t3
)
SELECT leg, count(*) AS n_users,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY lag_s), 6)
         AS p50_seconds
FROM legs GROUP BY 1
"""


BASKET_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_basket_pairs": q_basket_pairs,
    "q_funnel_lag": q_funnel_lag,
}

BASKET_ORACLES: dict[str, str] = {
    "q_basket_pairs": Q_BASKET_PAIRS_SQL,
    "q_funnel_lag": Q_FUNNEL_LAG_SQL,
}
