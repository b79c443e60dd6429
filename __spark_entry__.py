"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with
its DuckDB oracle twin. Column names are aliased identically on both sides;
aggregate arithmetic goes through exact decimal sums cast to double so
value hashes match bit-for-bit across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_example_spark.plans import ANALYTIC_ORACLES, ANALYTIC_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's 'calculated' table shape) on sf0.001."""
    return ANALYTIC_QUERIES["q_calculated"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(ANALYTIC_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(ANALYTIC_ORACLES)
    return out
