"""Token-budget survival curve over a lexical-diversity threshold.

The planning question behind every quality gate: "if we keep only
documents above threshold t, how many training tokens survive?" —
answered as a CURVE, not a single point, so the mixture planner
(``mix_weights`` / ``sample_allocation``) can trade corpus size
against quality without re-running the filter per candidate t.

The thresholded metric here is the TYPE-TOKEN RATIO (distinct tokens /
tokens — the standard lexical-diversity score; ``text_quality``'s
dup_ratio is its complement, but this module computes its own two-call
expression rather than editing the evidence-frozen text.py), bucketed
onto a 1/20 grid by ``floor(ttr * 20)`` — one multiply and one floor,
both exactly rounded IEEE ops, so the bucket id is cross-engine exact.

Output, one row per occupied bucket, descending cumulative:
(ttr_bucket, n_docs, n_tokens, cum_docs, cum_tokens) — cum_* counts
docs/tokens at or ABOVE the bucket, i.e. the surviving budget when the
gate is set at that bucket's lower edge.

Scale shape: one documents scan with per-doc scalar expressions; one
map-side-combined groupBy over ≤ 21 bucket rows; the running sum's
window is over those ≤ 21 rows (bucket-cardinality-bounded — never a
corpus-sized single-partition window). All sums integer: bit-exact.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens
from etl_pipeline_example_spark.sources.readers import read_table

TTR_GRID = 20


def token_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ttr_bucket, n_docs, n_tokens, cum_docs, cum_tokens): per
    type-token-ratio bucket, the doc/token mass and the surviving
    budget at-or-above the bucket."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    toks = spark_tokens("text")
    per_doc = docs.select(
        F.expr(f"size({toks})").alias("nt"),
        F.expr(f"size(array_distinct({toks}))").alias("nd"),
    ).filter(F.col("nt") > 0)
    buckets = (
        per_doc.select(
            F.expr(
                f"cast(floor(cast(nd as double) / cast(nt as double)"
                f" * {TTR_GRID}) as bigint)"
            ).alias("ttr_bucket"),
            "nt",
        )
        .groupBy("ttr_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
    )
    w = Window.orderBy(F.col("ttr_bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return buckets.select(
        "ttr_bucket",
        "n_docs",
        "n_tokens",
        F.sum("n_docs").over(w).alias("cum_docs"),
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    ).orderBy("ttr_bucket")


TOKEN_BUDGET_CURVE_SQL = f"""
WITH per_doc AS (
  SELECT len({duck_tokens("text")}) AS nt,
         len(list_distinct({duck_tokens("text")})) AS nd
  FROM documents
),
buckets AS (
  SELECT cast(floor(cast(nd as double) / cast(nt as double) * {TTR_GRID}) as bigint)
           AS ttr_bucket,
         count(*) AS n_docs,
         cast(sum(nt) as bigint) AS n_tokens
  FROM per_doc WHERE nt > 0 GROUP BY 1
)
SELECT ttr_bucket, n_docs, n_tokens,
       cast(sum(n_docs) OVER (ORDER BY ttr_bucket DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
         AS cum_docs,
       cast(sum(n_tokens) OVER (ORDER BY ttr_bucket DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
         AS cum_tokens
FROM buckets ORDER BY ttr_bucket
"""


BUDGETCURVE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "token_budget_curve": token_budget_curve,
}

BUDGETCURVE_ORACLES: dict[str, str] = {
    "token_budget_curve": TOKEN_BUDGET_CURVE_SQL,
}
