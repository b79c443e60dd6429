"""Order backlog timeline: interval stabbing count by delta + prefix
sum.

"How many orders were OPEN on each day" is an interval-stabbing count
(open interval = order date → last line shipment). The naive form
joins every day against every interval — quadratic; the scale answer
is the DELTA decomposition every time-series engine uses: each
interval contributes +1 at its start day and −1 the day after its
end, the deltas aggregate to day grain (map-side combined), and one
cumulative sum over the CALENDAR-bounded day spine reconstructs the
level. The cumulative window is unpartitioned but runs on days, not
orders — the same boundedness argument the gapfill/interp spines pin.

Exactness: deltas and the running level are integers end-to-end; the
window accumulates in frame order over a unique day key, identical in
both engines.

Scale: the corpus-sized work is two aggregates (order open day; per-
order max ship day via ONE (orderkey)-keyed reduce); the spine join
and cumsum touch days only.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_open): orders whose open interval (order date → last
    line ship date) covers each calendar day."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr("cast(o_orderdate as date)").alias("opened")
    )
    closed = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.expr("max(cast(l_shipdate as date))").alias("closed"))
    )
    # orders without lineitems never close inside the data: drop them
    # from the census (inner join) — the interval needs both ends
    spans = orders.join(closed, "o_orderkey")
    deltas = (
        spans.select(F.col("opened").alias("day"), F.lit(1).alias("d"))
        .unionAll(
            spans.select(
                F.expr("date_add(closed, 1)").alias("day"),
                F.lit(-1).alias("d"),
            )
        )
        .groupBy("day")
        .agg(F.sum("d").alias("delta"))
    )
    span = spans.agg(
        F.min("opened").alias("d0"), F.max("closed").alias("d1")
    )
    spine = span.select(
        F.explode(F.expr("sequence(d0, d1)")).alias("day")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(deltas, "day", "left")
        .select("day", F.coalesce("delta", F.lit(0)).alias("delta"))
        .select(
            "day", F.sum("delta").over(w).cast("bigint").alias("n_open")
        )
        .orderBy("day")
    )


Q_ORDER_BACKLOG_SQL = """
WITH spans AS (
  SELECT o.o_orderkey, cast(o.o_orderdate AS date) AS opened, c.closed
  FROM orders o
  JOIN (
    SELECT l_orderkey AS o_orderkey, max(cast(l_shipdate AS date)) AS closed
    FROM lineitem GROUP BY 1
  ) c ON o.o_orderkey = c.o_orderkey
),
deltas AS (
  SELECT day, cast(sum(d) AS bigint) AS delta FROM (
    SELECT opened AS day, 1 AS d FROM spans
    UNION ALL
    SELECT closed + 1 AS day, -1 AS d FROM spans
  ) GROUP BY 1
),
span AS (SELECT min(opened) AS d0, max(closed) AS d1 FROM spans),
spine AS (
  SELECT cast(d0 + cast(o AS integer) AS date) AS day
  FROM span CROSS JOIN (SELECT unnest(range(0, 100000)) AS o)
  WHERE d0 + cast(o AS integer) <= d1
)
SELECT s.day,
       cast(sum(coalesce(d.delta, 0)) OVER (
         ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS bigint) AS n_open
FROM spine s LEFT JOIN deltas d ON s.day = d.day
ORDER BY s.day
"""


BACKLOG_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_order_backlog": q_order_backlog,
}

BACKLOG_ORACLES: dict[str, str] = {
    "q_order_backlog": Q_ORDER_BACKLOG_SQL,
}
