"""Zipf rank-frequency diagnostic over the vocabulary.

Natural text follows rank × frequency ≈ const (Zipf's law); machine-
generated or templated corpora deviate sharply, so the head of the
rank-frequency table is a one-glance naturalness diagnostic (and the
empirical input to Heaps/Zipf-based vocabulary-size planning for
tokenizers). Emits the top-``ZIPF_TOP`` terms with rank, count, and
the rank·count product whose flatness IS the law.

Scale shape: one explode + map-side-combined term count (vocabulary-
bounded), a TakeOrderedAndProject top-K, and the rank assigned by a
window over ONLY those K rows — never a global rank of the vocabulary.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 30d.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens
from etl_pipeline_example_spark.sources.readers import read_table

ZIPF_TOP = 30


def vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, term, n, rank_x_n): the rank-frequency head, ties broken
    by term for a deterministic ranking."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    counts = (
        docs.select(F.explode(F.expr(spark_tokens("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(ZIPF_TOP)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .select("rank", "term", "n", F.expr("rank * n").alias("rank_x_n"))
        .orderBy("rank")
    )


VOCAB_ZIPF_SQL = f"""
WITH counts AS (
  SELECT term, count(*) AS n
  FROM (SELECT unnest({duck_tokens("text")}) AS term FROM documents)
  GROUP BY 1 ORDER BY n DESC, term LIMIT {ZIPF_TOP}
)
SELECT rank, term, n, rank * n AS rank_x_n FROM (
  SELECT term, n,
         cast(row_number() OVER (ORDER BY n DESC, term) AS int) AS rank
  FROM counts
) ORDER BY rank
"""


ZIPF_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "vocab_zipf": vocab_zipf,
}

ZIPF_ORACLES: dict[str, str] = {
    "vocab_zipf": VOCAB_ZIPF_SQL,
}
