"""Equi-depth histogram: the optimizer's-eye view of a column.

``q_histogram`` (plans/relational.py) buckets by equal WIDTH — which
collapses for skewed data (one bucket holds everything). Equi-DEPTH
buckets hold equal row counts instead; they're what query optimizers
and data-profilers actually store, and the boundaries double as the
quantile sketch of the column. Boundaries come from ONE exact
percentile aggregate (partial+merge, the q_decile_lift pin — never a
global sort), broadcast back; each row buckets itself by comparison.

The census reports each bucket's row count and value range — counts
are near-equal by construction (ties at boundaries make them unequal
in exactly the way the exact computation reproduces bit-for-bit in
both engines).

Exactness: boundaries are bit-identical percentiles; min/max are
comparisons; counts integers.

Scale: one map-side-combined aggregate over the scan + a bounded
percentile state; no window, no sort.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

N_BUCKETS = 8
_CUTS = [i / N_BUCKETS for i in range(1, N_BUCKETS)]


def _bucket_case() -> str:
    return (
        "CASE "
        + " ".join(
            f"WHEN v <= c{i} THEN {i}" for i in range(1, N_BUCKETS)
        )
        + f" ELSE {N_BUCKETS} END"
    )


def q_histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, n_rows, lo, hi): 8-bucket equi-depth histogram of
    o_totalprice."""
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v")
    )
    cuts = orders.agg(
        *[
            F.expr(f"percentile(v, {c})").alias(f"c{i}")
            for i, c in enumerate(_CUTS, start=1)
        ]
    )
    return (
        orders.crossJoin(F.broadcast(cuts))
        .select(F.expr(_bucket_case()).alias("bucket"), "v")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )


def _equidepth_sql() -> str:
    cut_cols = ",\n         ".join(
        f"percentile_cont({c}) WITHIN GROUP (ORDER BY v) AS c{i}"
        for i, c in enumerate(_CUTS, start=1)
    )
    return f"""
WITH vals AS (SELECT o_totalprice AS v FROM orders),
cuts AS (
  SELECT {cut_cols}
  FROM vals
),
bucketed AS (
  SELECT {_bucket_case()} AS bucket, v FROM vals CROSS JOIN cuts
)
SELECT bucket, count(*) AS n_rows, min(v) AS lo, max(v) AS hi
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""


EQUIDEPTH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_histogram_equi_depth": q_histogram_equi_depth,
}

EQUIDEPTH_ORACLES: dict[str, str] = {
    "q_histogram_equi_depth": _equidepth_sql(),
}
