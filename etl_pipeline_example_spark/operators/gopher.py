"""Gopher-style document quality rules (Rae et al. 2021, §A1.1).

The MassiveText pipeline's word-level admission rules, the standard
companion to the C4 gate (quality_c4 covers C4's line heuristics,
quality_repetition covers Gopher's repetition gates — this entry adds
Gopher's DOCUMENT-SHAPE rules): word-count bounds, mean-word-length
bounds, minimum alphabetic-word fraction, and minimum stop-word
presence. Output is the per-source rule-failure census — which
corpora die on which rule, the triage table a curation run starts
from.

Exactness: every rule is integer-only. Mean word length in [3, 10]
is evaluated as 3·n_words ≤ Σlen ≤ 10·n_words (no division); the
80 % alphabetic-word floor as 5·n_alpha ≥ 4·n_words; stop-word
presence counts DISTINCT canonical stop words via a filter over the
8-element stop list (each probe an array_contains against the doc's
token array — no intersect, whose dedup semantics differ between
engines).

Scale: one projection computes all per-doc flags inside the token
array (tokenize → size/fold/filter, no explode — the shuffle carries
five small integers per source), then ONE map-side-combined
groupBy(source) folds the census. Source-bounded output.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md
§2. Registered beyond the round-13 grading window — first driver
slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_tokens,
    spark_tokens,
)
from etl_pipeline_example_spark.sources.readers import read_table

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3
GOPHER_MAX_MEAN_LEN = 10
# Rae et al. 2021 §A1.1: "at least two of the following stop words"
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPS = 2


def quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, fail_wordcount, fail_wordlen, fail_alpha,
    fail_stop, n_pass): Gopher document-shape rule census per
    source."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    flags = docs.select(
        "source",
        F.expr(f"{spark_tokens('text')}").alias("toks"),
    ).select(
        "source",
        F.expr("size(toks)").alias("nw"),
        F.expr(
            "aggregate(toks, cast(0 as bigint), (a, t) -> a + length(t))"
        ).alias("sumlen"),
        F.expr("size(filter(toks, t -> t rlike '[a-z]'))").alias("n_alpha"),
        F.expr(
            f"size(filter(array({stops}), s -> array_contains(toks, s)))"
        ).alias("n_stops"),
    )
    return (
        flags.select(
            "source",
            F.expr(
                f"nw < {GOPHER_MIN_WORDS} OR nw > {GOPHER_MAX_WORDS}"
            ).alias("f_wc"),
            F.expr(
                f"sumlen < {GOPHER_MIN_MEAN_LEN} * nw"
                f" OR sumlen > {GOPHER_MAX_MEAN_LEN} * nw"
            ).alias("f_wl"),
            F.expr("5 * n_alpha < 4 * nw").alias("f_al"),
            F.expr(f"n_stops < {GOPHER_MIN_STOPS}").alias("f_st"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("f_wc"), 1).otherwise(0)).alias(
                "fail_wordcount"
            ),
            F.sum(F.when(F.col("f_wl"), 1).otherwise(0)).alias(
                "fail_wordlen"
            ),
            F.sum(F.when(F.col("f_al"), 1).otherwise(0)).alias("fail_alpha"),
            F.sum(F.when(F.col("f_st"), 1).otherwise(0)).alias("fail_stop"),
            F.sum(
                F.when(
                    ~F.col("f_wc") & ~F.col("f_wl") & ~F.col("f_al")
                    & ~F.col("f_st"),
                    1,
                ).otherwise(0)
            ).alias("n_pass"),
        )
        .orderBy("source")
    )


def _gopher_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    return f"""
WITH toks AS (
  SELECT source, {duck_tokens("text")} AS toks FROM documents
),
flags AS (
  SELECT source,
         len(toks) AS nw,
         coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
           AS sumlen,
         len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
           AS n_alpha,
         len(list_filter([{stops}], s -> list_contains(toks, s)))
           AS n_stops
  FROM toks
),
rules AS (
  SELECT source,
         nw < {GOPHER_MIN_WORDS} OR nw > {GOPHER_MAX_WORDS} AS f_wc,
         sumlen < {GOPHER_MIN_MEAN_LEN} * nw
           OR sumlen > {GOPHER_MAX_MEAN_LEN} * nw AS f_wl,
         5 * n_alpha < 4 * nw AS f_al,
         n_stops < {GOPHER_MIN_STOPS} AS f_st
  FROM flags
)
SELECT source,
       count(*) AS n_docs,
       cast(sum(CASE WHEN f_wc THEN 1 ELSE 0 END) AS bigint)
         AS fail_wordcount,
       cast(sum(CASE WHEN f_wl THEN 1 ELSE 0 END) AS bigint)
         AS fail_wordlen,
       cast(sum(CASE WHEN f_al THEN 1 ELSE 0 END) AS bigint) AS fail_alpha,
       cast(sum(CASE WHEN f_st THEN 1 ELSE 0 END) AS bigint) AS fail_stop,
       cast(sum(CASE WHEN NOT f_wc AND NOT f_wl AND NOT f_al AND NOT f_st
                THEN 1 ELSE 0 END) AS bigint) AS n_pass
FROM rules
GROUP BY source
ORDER BY source
"""


QUALITY_GOPHER_SQL = _gopher_sql()


GOPHER_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "quality_gopher": quality_gopher,
}

GOPHER_ORACLES: dict[str, str] = {
    "quality_gopher": QUALITY_GOPHER_SQL,
}
