"""Integer sample-budget allocation across sources (largest remainder).

Mixture sampling starts from target proportions (``mix_weights``,
``dsir_weights``) but a shard writer needs INTEGER document counts that
sum exactly to the budget — "sample 12.37 docs from src3" is not a
plan. The standard apportionment answer is Hamilton's largest-remainder
method: give every source floor(B·n_i/N), then hand the leftover seats
to the largest fractional remainders. All arithmetic here is exact
BIGINT (B·n_i div N and B·n_i mod N — no doubles anywhere), so the
allocation is reproducible bit-for-bit across engines and re-runs,
which matters because the numbers feed ``sample_hash``-style
deterministic selection downstream.

Scale shape: one corpus aggregation (groupBy source, map-side
combined) collapses 100 TB to a sources-bounded frame; the ranking
window and total-sum run on that tiny frame — a driver-sized problem
expressed declaratively, no collect. Invariant Σ alloc_i = B holds by
construction (checked in the unit test).

No reference counterpart (reference: glue_jobs/example_job/job.py);
LLM-pipeline surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

SAMPLE_BUDGET = 100  # documents to draw across all sources


def sample_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, alloc): largest-remainder split of
    ``SAMPLE_BUDGET`` across sources, Σ alloc = budget exactly."""
    b = SAMPLE_BUDGET
    counts = (
        read_table(spark, sf_dir, "documents", parallel=True)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    everything = Window.partitionBy()
    ranked = counts.select(
        "source",
        "n_docs",
        F.sum("n_docs").over(everything).alias("total"),
    ).select(
        "source",
        "n_docs",
        F.expr(f"{b} * n_docs div total").alias("base"),
        F.expr(f"{b} * n_docs % total").alias("rem"),
    )
    ranked = ranked.select(
        "source",
        "n_docs",
        "base",
        F.row_number()
        .over(everything.orderBy(F.col("rem").desc(), F.col("source").asc()))
        .alias("rk"),
        F.sum("base").over(everything).alias("base_total"),
    )
    return ranked.select(
        "source",
        "n_docs",
        F.expr(f"base + CASE WHEN rk <= {b} - base_total THEN 1 ELSE 0 END").alias(
            "alloc"
        ),
    ).orderBy("source")


SAMPLE_ALLOCATION_SQL = f"""
WITH counts AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
),
ranked AS (
  SELECT source, n_docs,
         ({SAMPLE_BUDGET} * n_docs) // sum(n_docs) OVER () AS base,
         ({SAMPLE_BUDGET} * n_docs) % sum(n_docs) OVER () AS rem
  FROM counts
),
seats AS (
  SELECT source, n_docs, base,
         row_number() OVER (ORDER BY rem DESC, source) AS rk,
         sum(base) OVER () AS base_total
  FROM ranked
)
SELECT source, n_docs,
       cast(base + CASE WHEN rk <= {SAMPLE_BUDGET} - base_total
                        THEN 1 ELSE 0 END AS bigint) AS alloc
FROM seats
ORDER BY source
"""


ALLOCATION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sample_allocation": sample_allocation,
}

ALLOCATION_ORACLES: dict[str, str] = {
    "sample_allocation": SAMPLE_ALLOCATION_SQL,
}
