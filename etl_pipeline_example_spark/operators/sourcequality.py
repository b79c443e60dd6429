"""Per-source quality panel: the domain-level quality report.

``text_quality`` scores documents; the decision a pipeline owner makes
is per DOMAIN — which sources get capped, down-weighted, or dropped —
so the panel aggregates the composite quality score by source: count,
mean, median, and the share of docs under a floor. Composes
``text_quality`` (its full oracle SQL wrapped as a CTE); the 6-dp
scores accumulate as exact decimals (order-independent) with single
double divisions at the end.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 29e.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.text import TEXT_ORACLES, text_quality
from etl_pipeline_example_spark.sources.readers import read_table

QUALITY_FLOOR = 0.5


def source_quality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, mean_quality, p50_quality, low_share): the
    per-domain quality panel, ascending mean (worst domain first).

    Scale shape: the scorer is a pure scan; one doc_id-keyed join to
    recover the source column and a sources-bounded aggregate after
    the map-side combine.
    """
    scores = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    docs = read_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", "source"
    )
    return (
        docs.join(scores, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "round(cast(sum(cast(quality_score as decimal(10,6))) as double)"
                " / count(*), 6)"
            ).alias("mean_quality"),
            F.expr("round(percentile(quality_score, 0.5), 6)").alias("p50_quality"),
            F.expr(
                f"round(cast(sum(CASE WHEN quality_score < {QUALITY_FLOOR}"
                " THEN 1 ELSE 0 END) as double) / count(*), 6)"
            ).alias("low_share"),
        )
        .orderBy(F.col("mean_quality").asc(), F.col("source").asc())
    )


SOURCE_QUALITY_SQL = f"""
WITH scores AS ({TEXT_ORACLES["text_quality"]}),
joined AS (
  SELECT d.source, s.quality_score
  FROM documents d JOIN scores s USING (doc_id)
)
SELECT source, count(*) AS n_docs,
       round(cast(sum(cast(quality_score AS decimal(10,6))) AS double)
             / count(*), 6) AS mean_quality,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY quality_score), 6)
         AS p50_quality,
       round(cast(sum(CASE WHEN quality_score < {QUALITY_FLOOR}
                      THEN 1 ELSE 0 END) AS double) / count(*), 6)
         AS low_share
FROM joined
GROUP BY 1
ORDER BY mean_quality, source
"""


SOURCEQUALITY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "source_quality_matrix": source_quality_matrix,
}

SOURCEQUALITY_ORACLES: dict[str, str] = {
    "source_quality_matrix": SOURCE_QUALITY_SQL,
}
