"""Rolling median over a bounded row frame — order-statistic windows.

Means over sliding frames are one expression (``q_moving_avg``); rolling
ORDER STATISTICS are the robust-smoothing counterpart every monitoring
stack wants (a median shrugs off the one-off whale order that drags a
mean), and engines differ wildly in how/whether they expose them. The
portable exact construction: collect the frame into an array, sort it,
pick the LOWER median by index — no interpolation, no float arithmetic,
just comparisons and an integer index, so cross-engine equality is
structural.

Per customer, over orders ordered by (o_orderdate, o_orderkey), frame =
the trailing 7 orders (6 preceding + current):

    med = sorted(frame)[ (n + 1) DIV 2 ]     (1-based; lower median)

Scale shape: one hash exchange on o_custkey, per-partition sort, and a
BOUNDED frame (≤ 7 values buffered per row — constant memory, unlike an
unbounded collect). The sort inside the frame is over ≤ 7 elements.

Oracle: DuckDB ``list() OVER (... ROWS BETWEEN 6 PRECEDING AND CURRENT
ROW)`` + ``list_sort`` + 1-based index — the same multiset, the same
pick, so frame-collection order (which neither engine guarantees) never
matters.

No reference counterpart (305-LoC Glue ETL); engine surface, SURVEY.md
§2. Registered beyond the round-12 grading window — first driver slot
round 13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from etl_pipeline_example_spark.sources.readers import read_table

FRAME = 6  # preceding rows; frame size = FRAME + 1


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, o_orderkey, n_window, roll_median): lower median of
    o_totalprice over each customer's trailing 7 orders."""
    orders = read_table(spark, sf_dir, "orders")
    # ONE window spec string feeds every expression — the partition/
    # order/frame keys exist in exactly one place, so the count used
    # for the median index can never desynchronize from the frame the
    # array is collected over
    win = (
        f"(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        f"ROWS BETWEEN {FRAME} PRECEDING AND CURRENT ROW)"
    )
    return orders.selectExpr(
        "o_custkey",
        "o_orderkey",
        f"count(*) OVER {win} AS n_window",
        f"element_at(array_sort(collect_list(o_totalprice) OVER {win}),"
        f" CAST((count(*) OVER {win} + 1) DIV 2 AS INT)) AS roll_median",
    )


Q_ROLLING_MEDIAN_SQL = f"""
SELECT o_custkey, o_orderkey,
       cast(count(*) OVER w AS bigint) AS n_window,
       list_sort(list(o_totalprice) OVER w)[
         cast((count(*) OVER w + 1) // 2 AS int)
       ] AS roll_median
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN {FRAME} PRECEDING AND CURRENT ROW
)
"""


ROLLMED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_rolling_median": q_rolling_median,
}

ROLLMED_ORACLES: dict[str, str] = {
    "q_rolling_median": Q_ROLLING_MEDIAN_SQL,
}
