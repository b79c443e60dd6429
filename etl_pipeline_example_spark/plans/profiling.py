"""Sketch-based column profiling — the 100 TB form of ``dq_profile``.

``dq_profile`` (plans/relational.py) computes exact distinct counts and
exact percentiles; both are the operators that stop scaling first
(exact count-distinct shuffles every distinct value, exact percentiles
buffer whole columns). This module is the production twin its docstring
promises: HyperLogLog++ ``approx_count_distinct`` (fixed-size sketch
per column, mergeable map-side — the shuffle carries a few KB per
partition regardless of cardinality) and Greenwald-Khanna
``approx_percentile`` (bounded summary, same property). One aggregation
pass computes every metric; per-column rows unpivot from the single
result row via ``stack``.

No SQL oracle by design: sketch estimates are implementation-defined
(DuckDB's approx_count_distinct uses a different HLL construction, so
cross-engine value equality is unattainable) — the driver records the
weaker rows-only check, and the REAL contract is pytest-pinned instead:
estimates must land within the sketches' published error bounds of the
exact answers computed by ``dq_profile``'s machinery.

Generalizes the reference's validation gate the same way dq_profile
does (reference: python_scripts/test_data.py row-count checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

HLL_RSD = 0.02  # HLL++ target relative standard deviation
PCTL_ACCURACY = 10000  # GK summary accuracy (err <= 1/accuracy of rank)


def dq_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based profile of the orders table: one row per column with
    (col_name, n_rows, n_nulls, approx_distinct, p50, p90).

    Scale shape: ONE aggregation pass over the scan — every sketch is a
    fixed-size, mergeable aggregation buffer, so the shuffle after the
    map-side partial carries kilobytes per partition however many
    distinct values or rows exist. That bounded-state property is
    exactly what the exact dq_profile loses at 100 TB.
    """
    orders = read_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END")).alias("null_status"),
        F.expr(f"approx_count_distinct(o_orderstatus, {HLL_RSD})").alias("dist_status"),
        F.sum(F.expr("CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END")).alias("null_cust"),
        F.expr(f"approx_count_distinct(o_custkey, {HLL_RSD})").alias("dist_cust"),
        F.expr(
            f"cast(approx_percentile(o_custkey, 0.5, {PCTL_ACCURACY}) as double)"
        ).alias("p50_cust"),
        F.expr(
            f"cast(approx_percentile(o_custkey, 0.9, {PCTL_ACCURACY}) as double)"
        ).alias("p90_cust"),
        F.sum(F.expr("CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END")).alias("null_price"),
        F.expr(f"approx_count_distinct(o_totalprice, {HLL_RSD})").alias("dist_price"),
        F.expr(
            f"cast(approx_percentile(cast(o_totalprice as double), 0.5, {PCTL_ACCURACY}) as double)"
        ).alias("p50_price"),
        F.expr(
            f"cast(approx_percentile(cast(o_totalprice as double), 0.9, {PCTL_ACCURACY}) as double)"
        ).alias("p90_price"),
    )
    return agg.select(
        F.expr(
            "stack(3,"
            " 'o_orderstatus', n_rows, null_status, dist_status, cast(null as double), cast(null as double),"
            " 'o_custkey', n_rows, null_cust, dist_cust, p50_cust, p90_cust,"
            " 'o_totalprice', n_rows, null_price, dist_price, p50_price, p90_price)"
            " AS (col_name, n_rows, n_nulls, approx_distinct, p50, p90)"
        )
    )


PROFILE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_profile_approx": dq_profile_approx,
}

# intentionally empty: sketch values are engine-specific (see module doc)
PROFILE_ORACLES: dict[str, str] = {}
