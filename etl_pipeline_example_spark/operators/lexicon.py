"""Per-source lexicon profile: vocabulary size, hapax rate, Gini impurity.

The corpus-health panel data-mixing decisions read before weighting a
source: how big is its vocabulary relative to its token mass (Heaps-law
position), how heavy is the unreliably-estimated tail (hapax share),
and how concentrated is the unigram distribution (Gini impurity + top
token share). A source whose Gini impurity collapses is template spam;
one whose hapax share explodes is OCR noise — both invisible to doc
counts and length stats.

Exactness: every aggregate is an exact integer (counts, sum of squared
counts as bigint); the four ratios are then single double
divisions/multiplications in textually identical order on both sides.
Entropy is deliberately NOT emitted — log() ulps differ across engines
— Gini impurity (1 - Σp²) carries the same concentration signal in
rational arithmetic.

Scale: tokenize+explode is the linear pass; groupBy (source, token) is
map-side combined (per-partition keyspace is bounded by vocabulary, so
the shuffle carries vocab-sized partials, not token instances); the
per-source fold is O(|vocab|) with 5 keys. Σp² is computed as
double(Σcnt²)/double(N)² rather than integer N² — N² overflows bigint
past ~3×10⁹ tokens per source, which 100 TB corpora exceed.

No reference counterpart (the reference is a 305-LoC Glue ETL example);
LLM-pipeline surface, SURVEY.md §2. Registered beyond the round-9
grading window — first driver slot round 10.
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


def lexicon_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, n_types, n_hapax, hapax_share, gini_impurity,
    top_share): unigram lexicon profile per source."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    tf = (
        docs.select(
            "source", F.explode(F.expr(spark_tokens("text"))).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        tf.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.expr("CASE WHEN cnt = 1 THEN 1 ELSE 0 END")).alias(
                "n_hapax"
            ),
            F.sum(F.expr("cnt * cnt")).alias("sum_sq"),
            F.max("cnt").alias("max_cnt"),
        )
        .selectExpr(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            "cast(n_hapax as double) / cast(n_types as double)"
            " AS hapax_share",
            "cast(1 as double) - cast(sum_sq as double)"
            " / (cast(n_tokens as double) * cast(n_tokens as double))"
            " AS gini_impurity",
            "cast(max_cnt as double) / cast(n_tokens as double)"
            " AS top_share",
        )
        .orderBy("source")
    )


LEXICON_STATS_SQL = f"""
WITH tf AS (
  SELECT source, unnest({duck_tokens("text")}) AS token
  FROM documents
),
cnts AS (
  SELECT source, token, count(*) AS cnt FROM tf GROUP BY 1, 2
),
folded AS (
  SELECT source,
         cast(sum(cnt) AS bigint) AS n_tokens,
         count(*) AS n_types,
         cast(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS bigint)
           AS n_hapax,
         cast(sum(cnt * cnt) AS bigint) AS sum_sq,
         max(cnt) AS max_cnt
  FROM cnts GROUP BY 1
)
SELECT source, n_tokens, n_types, n_hapax,
       cast(n_hapax as double) / cast(n_types as double) AS hapax_share,
       cast(1 as double) - cast(sum_sq as double)
         / (cast(n_tokens as double) * cast(n_tokens as double))
         AS gini_impurity,
       cast(max_cnt as double) / cast(n_tokens as double) AS top_share
FROM folded
ORDER BY source
"""


LEXICON_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lexicon_stats": lexicon_stats,
}

LEXICON_ORACLES: dict[str, str] = {
    "lexicon_stats": LEXICON_STATS_SQL,
}
