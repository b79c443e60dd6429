"""Corpus overview statistics: the dashboard row and the per-domain
duplication diagnostic.

Two reporting queries every corpus owner refreshes after a pipeline
run:

  corpus_stats        ONE row: docs, token occurrences, vocabulary
                      size, overall type/token ratio, mean doc length
                      (both exact integer-ratio rounds), exact-dup
                      count — the health line a run report leads with.
  dup_rate_by_source  exact-duplicate rate per domain (docs vs
                      distinct content hashes) — WHICH domains
                      duplicate is the first question when the global
                      dup count moves; rate in integer-derived 6-dp
                      rounds.

Scale shape: corpus_stats is two aggregation passes (token explode →
vocab/token counts map-side combined; content-hash distinct), each
bounded-output; dup_rate is one groupBy(source) with two-phase
count-distinct. Nothing wide shuffles.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 rows 20n6–20n7.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_norm_text,
    duck_tokens,
    spark_norm_text,
    spark_tokens,
)
from etl_pipeline_example_spark.sources.readers import read_table


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_docs, n_tokens, vocab, type_token_ratio, mean_doc_tokens,
    n_exact_dups) — one row."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    tok = docs.select(
        "doc_id", F.explode(F.expr(spark_tokens("text"))).alias("term")
    )
    t = tok.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("term").alias("vocab"),
    )
    d = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.expr(f"md5({spark_norm_text('text')})"))
        ).alias("n_exact_dups"),
    )
    return (
        d.crossJoin(t)
        .select(
            "n_docs",
            "n_tokens",
            "vocab",
            F.expr(
                "round(cast(vocab as double) / cast(n_tokens as double), 6)"
            ).alias("type_token_ratio"),
            F.expr(
                "round(cast(n_tokens as double) / cast(n_docs as double), 6)"
            ).alias("mean_doc_tokens"),
            "n_exact_dups",
        )
    )


CORPUS_STATS_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({duck_tokens("text")}) AS term FROM documents
),
t AS (
  SELECT count(*) AS n_tokens, count(DISTINCT term) AS vocab FROM tok
),
d AS (
  SELECT count(*) AS n_docs,
         count(*) - count(DISTINCT md5({duck_norm_text("text")})) AS n_exact_dups
  FROM documents
)
SELECT cast(n_docs AS bigint) AS n_docs,
       cast(n_tokens AS bigint) AS n_tokens,
       cast(vocab AS bigint) AS vocab,
       round(cast(vocab AS double) / cast(n_tokens AS double), 6) AS type_token_ratio,
       round(cast(n_tokens AS double) / cast(n_docs AS double), 6) AS mean_doc_tokens,
       cast(n_exact_dups AS bigint) AS n_exact_dups
FROM d, t
"""


def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_distinct, n_dups, dup_rate) per domain,
    descending dup_rate then source."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    return (
        docs.select(
            "source", F.expr(f"md5({spark_norm_text('text')})").alias("h")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            F.expr("n_docs - n_distinct").alias("n_dups"),
            F.expr(
                "round(cast(n_docs - n_distinct as double)"
                " / cast(n_docs as double), 6)"
            ).alias("dup_rate"),
        )
        .orderBy(F.col("dup_rate").desc(), F.col("source").asc())
    )


DUP_RATE_SQL = f"""
SELECT source, n_docs, n_distinct,
       n_docs - n_distinct AS n_dups,
       round(cast(n_docs - n_distinct AS double) / cast(n_docs AS double), 6)
         AS dup_rate
FROM (
  SELECT source, count(*) AS n_docs,
         count(DISTINCT md5({duck_norm_text("text")})) AS n_distinct
  FROM documents GROUP BY 1
)
ORDER BY dup_rate DESC, source
"""


CORPUSSTATS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_stats": corpus_stats,
    "dup_rate_by_source": dup_rate_by_source,
}

CORPUSSTATS_ORACLES: dict[str, str] = {
    "corpus_stats": CORPUS_STATS_SQL,
    "dup_rate_by_source": DUP_RATE_SQL,
}
