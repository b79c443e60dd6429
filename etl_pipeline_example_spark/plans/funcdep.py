"""Functional-dependency audit: how close is X → Y to holding?

Schema docs claim dependencies ("a part has one supplier", "a line
number identifies the line within an order"); data drifts. The standard
FD-violation count makes the claim measurable: for candidate X → Y,

    violations(X → Y) = Σ_x ( count(x) − max_y count(x, y) )

— the minimum number of rows you'd have to change for the dependency
to hold exactly (each x keeps its plurality y). 0 ⇔ the FD holds. All
counting and max — integer-exact by construction.

Plan per dependency: one map-side-combined groupBy(x, y), a max per x
over the (x, y) aggregate (bounded by the key domain, never the row
count), one subtraction, one sum. The audited dependencies span three
tables and are reported as one tall grid (the dataset_card / dq_rules
union-of-aggregates pattern).

No reference counterpart (the reference's test_data.py checks row
counts only); DQ surface, SURVEY.md §2. Registered beyond the
round-12 grading window — first driver slot round 13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

# (label, table, determinant cols, dependent col)
DEPENDENCIES = [
    ("orders: custkey->priority", "orders", ["o_custkey"], "o_orderpriority"),
    ("lineitem: partkey->suppkey", "lineitem", ["l_partkey"], "l_suppkey"),
    (
        "lineitem: (orderkey,lineno)->partkey",
        "lineitem",
        ["l_orderkey", "l_linenumber"],
        "l_partkey",
    ),
    ("events: user->event_type", "events", ["user_id"], "event_type"),
]


def _fd_frame(
    spark: SparkSession, sf_dir: str, label: str, table: str,
    xs: list[str], y: str,
) -> DataFrame:
    t = read_table(spark, sf_dir, table)
    xy = t.groupBy(*xs, y).agg(F.count(F.lit(1)).alias("n"))
    per_x = xy.groupBy(*xs).agg(
        F.sum("n").alias("n_rows"), F.max("n").alias("n_plurality")
    )
    return per_x.agg(
        F.lit(label).alias("dependency"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("n_rows"),
        F.sum(F.expr("n_rows - n_plurality")).alias("n_violations"),
    )


def dq_functional_dep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dependency, n_keys, n_rows, n_violations): minimum-change FD
    violation counts for the audited candidate dependencies."""
    out = None
    for label, table, xs, y in DEPENDENCIES:
        f = _fd_frame(spark, sf_dir, label, table, xs, y)
        out = f if out is None else out.unionByName(f)
    return out.orderBy("dependency")


def _fd_sql() -> str:
    parts = []
    for label, table, xs, y in DEPENDENCIES:
        xcols = ", ".join(xs)
        parts.append(f"""(
  WITH xy AS (
    SELECT {xcols}, {y}, count(*) AS n FROM {table} GROUP BY ALL
  ),
  per_x AS (
    SELECT {xcols}, cast(sum(n) AS bigint) AS n_rows,
           cast(max(n) AS bigint) AS n_plurality
    FROM xy GROUP BY ALL
  )
  SELECT '{label}' AS dependency,
         count(*) AS n_keys,
         cast(sum(n_rows) AS bigint) AS n_rows,
         cast(sum(n_rows - n_plurality) AS bigint) AS n_violations
  FROM per_x
)""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY dependency"


FUNCDEP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_functional_dep": dq_functional_dep,
}

FUNCDEP_ORACLES: dict[str, str] = {
    "dq_functional_dep": _fd_sql(),
}
