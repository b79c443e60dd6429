"""Recursive-CTE month spine with zero-filled revenue.

Spark 4 added ``WITH RECURSIVE`` (ANSI recursive common table
expressions); this entry exercises it on the canonical reporting need:
a COMPLETE month grid from the corpus's first to last order month —
months with no orders included as explicit zero rows, which a plain
GROUP BY can never produce. The recursion is DAG-safe by construction
(the next month strictly increases toward a data-derived bound, so
UNION ALL terminates; Spark rejects UNION in recursive CTEs, which
rules out fixpoint/graph recursions — this bounded-series form is the
supported shape).

``q_gapfill`` (plans/relational.py) fills day gaps with a
``sequence()`` explode; the recursive form is the ANSI-portable
equivalent a SQL-facade user would write, and the month arithmetic
(``add_months`` / ``+ INTERVAL 1 MONTH``) never leaves the date
domain.

Scale: the recursion generates a calendar-bounded spine (one row per
month — dozens, driver-trivial); the revenue side is one map-side-
combined month aggregate; the join is spine-sized; the recursive step carries the ``hi`` bound
INSIDE the spine rows, so no iteration re-evaluates the bounds scan
(a bounds join in the recursive term would re-read orders once per
generated month). Exactness: month
keys are dates, counts integers, revenue an exact decimal sum cast to
double once, zero-fill CAST(0 AS DOUBLE).

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_example_spark.plans.sqlfacade import run_sql

Q_MONTH_SPINE_SPARK_SQL = """
WITH RECURSIVE bounds AS (
  SELECT cast(date_trunc('MONTH', min(o_orderdate)) AS date) AS lo,
         cast(date_trunc('MONTH', max(o_orderdate)) AS date) AS hi
  FROM orders
),
spine(m, hi) AS (
  SELECT lo, hi FROM bounds
  UNION ALL
  SELECT add_months(m, 1), hi FROM spine WHERE m < hi
),
monthly AS (
  SELECT cast(date_trunc('MONTH', o_orderdate) AS date) AS m,
         count(*) AS n_orders,
         sum(cast(o_totalprice AS decimal(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT s.m AS month,
       coalesce(mo.n_orders, 0) AS n_orders,
       cast(coalesce(mo.rev, 0) AS double) AS revenue
FROM spine s LEFT JOIN monthly mo ON s.m = mo.m
ORDER BY s.m
"""

# identical semantics, DuckDB month arithmetic (+ INTERVAL 1 MONTH)
Q_MONTH_SPINE_DUCK_SQL = """
WITH RECURSIVE bounds AS (
  SELECT cast(date_trunc('month', min(o_orderdate)) AS date) AS lo,
         cast(date_trunc('month', max(o_orderdate)) AS date) AS hi
  FROM orders
),
spine(m, hi) AS (
  SELECT lo, hi FROM bounds
  UNION ALL
  SELECT cast(m + INTERVAL 1 MONTH AS date), hi FROM spine WHERE m < hi
),
monthly AS (
  SELECT cast(date_trunc('month', o_orderdate) AS date) AS m,
         count(*) AS n_orders,
         sum(cast(o_totalprice AS decimal(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT s.m AS month,
       coalesce(mo.n_orders, 0) AS n_orders,
       cast(coalesce(mo.rev, 0) AS double) AS revenue
FROM spine s LEFT JOIN monthly mo ON s.m = mo.m
ORDER BY s.m
"""


def q_month_spine_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(month, n_orders, revenue): complete month grid via WITH
    RECURSIVE, empty months zero-filled."""
    return run_sql(spark, sf_dir, Q_MONTH_SPINE_SPARK_SQL)


SPINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_month_spine_recursive": q_month_spine_recursive,
}

SPINE_ORACLES: dict[str, str] = {
    "q_month_spine_recursive": Q_MONTH_SPINE_DUCK_SQL,
}
