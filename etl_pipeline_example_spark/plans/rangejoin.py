"""Interval (range) join by bounded equi-decomposition.

The join shape Spark has no native operator for: match events to the
time WINDOW each order opens (here: the 3 days starting at
o_orderdate), i.e. ``e.day BETWEEN o.start AND o.end``. A naive range
join is a cartesian product with a filter — quadratic, the one shape
this repo bans. The distributed answer when the interval length is
bounded: EXPLODE each interval into its covered grain units (3 rows
per order — a constant fan-out) and the range join becomes a plain
EQUI-join on the grain, which hash-partitions, combines map-side, and
never compares a pair the ranges exclude.

The other scale lever: events pre-aggregate to (day, n) FIRST, so the
equi-join carries calendar-bounded day counts, never raw events —
join cost is |order-days| + |days|, independent of event volume.

Output is the per-priority census: how many orders, how many events
landed inside their windows, the mean per order (orders with silent
windows count in the denominator via the left join + coalesce).

Exactness: integer counts (DuckDB sum → HUGEINT cast back); the mean
is one double division. The DuckDB oracle states the SAME semantics
as a direct BETWEEN range join — the strongest cross-check that the
decomposition didn't change the query.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

WINDOW_DAYS = 3  # o_orderdate .. o_orderdate + 2, inclusive


def q_interval_event_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, n_orders, n_event_hits, events_per_order): events
    falling inside each order's 3-day window, rolled up by priority."""
    orders = read_table(spark, sf_dir, "orders")
    ev_daily = (
        read_table(spark, sf_dir, "events", parallel=True)
        .groupBy(F.expr("cast(ts as date)").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )
    order_days = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.explode(
            F.expr(
                "sequence(cast(o_orderdate as date),"
                f" date_add(cast(o_orderdate as date), {WINDOW_DAYS - 1}))"
            )
        ).alias("day"),
    )
    hits = (
        order_days.join(ev_daily, "day")
        .groupBy("priority")
        .agg(F.sum("n_ev").alias("n_event_hits"))
    )
    base = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        base.join(hits, "priority", "left")
        .select(
            "priority",
            "n_orders",
            F.coalesce("n_event_hits", F.lit(0)).alias("n_event_hits"),
            F.expr(
                "cast(coalesce(n_event_hits, 0) as double)"
                " / cast(n_orders as double)"
            ).alias("events_per_order"),
        )
        .orderBy("priority")
    )


# the oracle states the range join DIRECTLY (BETWEEN over the interval):
# a hash match certifies the equi-decomposition is the same query
Q_INTERVAL_EVENT_OVERLAP_SQL = f"""
WITH ev AS (
  SELECT cast(ts AS date) AS day, count(*) AS n_ev FROM events GROUP BY 1
),
hits AS (
  SELECT o.o_orderpriority AS priority, sum(e.n_ev) AS n_hits
  FROM orders o
  JOIN ev e ON e.day BETWEEN cast(o.o_orderdate AS date)
           AND cast(o.o_orderdate AS date) + {WINDOW_DAYS - 1}
  GROUP BY 1
),
base AS (
  SELECT o_orderpriority AS priority, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT b.priority, b.n_orders,
       cast(coalesce(h.n_hits, 0) AS bigint) AS n_event_hits,
       cast(coalesce(h.n_hits, 0) AS double) / cast(b.n_orders AS double)
         AS events_per_order
FROM base b LEFT JOIN hits h ON b.priority = h.priority
ORDER BY b.priority
"""


RANGEJOIN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_interval_event_overlap": q_interval_event_overlap,
}

RANGEJOIN_ORACLES: dict[str, str] = {
    "q_interval_event_overlap": Q_INTERVAL_EVENT_OVERLAP_SQL,
}
