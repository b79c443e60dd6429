"""Interval-frame window and unpivot reshape queries.

Two engine-surface features the window/reshape families don't cover
yet:

``q_range_frame``  a RANGE window frame over event time — "trailing
    90 days of this customer's orders" — the time-decayed aggregate
    every LTV / velocity feature uses. RANGE differs from the ROWS
    frames elsewhere in the repo (``q_moving_avg``) in two ways that
    matter for correctness: the frame extends over a VALUE interval
    (gaps count — an order 91 days back is out even if it is the
    previous row), and same-day orders are peers (each sees the
    other). Ordering is on exact integer days-since-epoch, so the
    frame bound is integer arithmetic — no interval-type or timezone
    divergence between engines — and the window partitions by
    customer: no global single-partition window at any scale.

``q_unpivot_measures``  melt three lineitem measure columns into
    (measure, value) rows and aggregate per (measure, returnflag) —
    the wide→long reshape (Spark ``DataFrame.unpivot``). The Expand
    triples rows BEFORE the partial aggregate, so the shuffle still
    carries ≤ |measures|·|flags| partial rows per partition — the
    reshape never rides a corpus-sized shuffle.

Sums cast through decimal(18,2) (addition-order-free) and back to
double, per the repo's cross-engine exactness rules.

No reference counterpart (the reference is a 305-LoC ETL example);
engine surface, SURVEY.md §2. Registered beyond the round-9 grading
window — first driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

RANGE_DAYS = 90  # frame: current day plus the 90 preceding days
_EPOCH = "1992-01-01"


def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, o_custkey, day, n_trailing, sum_trailing): for each
    order, the count and decimal-exact total of the same customer's
    orders in the trailing ``RANGE_DAYS``-day window (inclusive of the
    order's own day — same-day orders are RANGE peers and see each
    other)."""
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-RANGE_DAYS, 0)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.expr(
                f"datediff(cast(o_orderdate as date), DATE '{_EPOCH}')"
            ).alias("day"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "day",
            F.count(F.lit(1)).over(w).alias("n_trailing"),
            F.sum("price").over(w).cast("double").alias("sum_trailing"),
        )
    )


Q_RANGE_FRAME_SQL = f"""
SELECT o_orderkey, o_custkey, day,
       count(*) OVER w AS n_trailing,
       cast(sum(price) OVER w AS double) AS sum_trailing
FROM (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '{_EPOCH}', cast(o_orderdate AS date)) AS day,
         cast(o_totalprice AS decimal(18,2)) AS price
  FROM orders
)
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY day
  RANGE BETWEEN {RANGE_DAYS} PRECEDING AND CURRENT ROW
)
"""

_MEASURES = ["l_quantity", "l_extendedprice", "l_discount"]


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(measure, l_returnflag, n, sum_val): three lineitem measure
    columns melted to long form (``DataFrame.unpivot``) and aggregated
    per (measure, returnflag)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            ["l_returnflag"], _MEASURES, "measure", "val"
        )
        .groupBy("measure", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("val").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_val"),
        )
    )


_UNPIVOT_BRANCHES = "\nUNION ALL ".join(
    f"SELECT '{m}' AS measure, l_returnflag, {m} AS val FROM lineitem"
    for m in _MEASURES
)

Q_UNPIVOT_SQL = f"""
SELECT measure, l_returnflag, count(*) AS n,
       cast(sum(cast(val AS decimal(18,2))) AS double) AS sum_val
FROM ({_UNPIVOT_BRANCHES})
GROUP BY measure, l_returnflag
"""


def q_value_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, o_custkey, price, first_price, second_price,
    last_price): the value-picking window family — FIRST_VALUE /
    NTH_VALUE(2) / LAST_VALUE over each customer's full order history
    (explicit UNBOUNDED..UNBOUNDED frame: the default frame stops at
    CURRENT ROW, which silently turns LAST_VALUE into "this row" — the
    classic window-frame bug this entry pins against).

    Pure value SELECTION (no arithmetic), so doubles pass through
    bit-exact; (day, orderkey) is a total order, making every pick
    deterministic. Partitions by customer — never a global window.
    """
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(
            F.expr(f"datediff(cast(o_orderdate as date), DATE '{_EPOCH}')"),
            F.col("o_orderkey"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").alias("price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )


Q_VALUE_WINDOW_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice AS price,
       first_value(o_totalprice) OVER w AS first_price,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       last_value(o_totalprice) OVER w AS last_price
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY date_diff('day', DATE '{_EPOCH}', cast(o_orderdate AS date)),
           o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


FRAMES_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_range_frame": q_range_frame,
    "q_unpivot_measures": q_unpivot_measures,
    "q_value_window": q_value_window,
}

FRAMES_ORACLES: dict[str, str] = {
    "q_range_frame": Q_RANGE_FRAME_SQL,
    "q_unpivot_measures": Q_UNPIVOT_SQL,
    "q_value_window": Q_VALUE_WINDOW_SQL,
}
