"""Out-of-vocabulary rate on a train/eval corpus split.

The Heaps-law complement ``vocab_growth`` (operators/vocabgrowth.py)
measures: train a WORD vocabulary on the first half of the corpus
(the ``doc_id < INCR_SPLIT`` convention the incremental-dedup family
pins), then ask how much of the held-out half falls outside it —
token-level OOV (occurrence mass the vocab misses) and type-level OOV
(distinct unseen words), per source. These are the numbers that size
a tokenizer's byte-fallback budget and flag domains whose language
the training slice under-covers.

Spark-first shape: the train side reduces to a DISTINCT word set
(vocabulary-bounded, Heaps-sublinear); the eval side pre-aggregates
to (source, word, cnt) before the join, so the anti-membership check
joins vocab-sized keys, never token occurrences; one left join +
conditional sums. No text ever rides a shuffle — only words and
counts.

Exactness: integer counts; the two rates are int/int double
divisions.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md
§2. Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_tokens,
    spark_tokens,
)
from etl_pipeline_example_spark.operators.incremental import INCR_SPLIT
from etl_pipeline_example_spark.sources.readers import read_table


def vocab_oov_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_eval_tokens, n_oov_tokens, token_oov_rate,
    n_eval_types, n_oov_types, type_oov_rate): held-out OOV per
    source, vocabulary trained on doc_id < INCR_SPLIT."""
    toks = spark_tokens("text")
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    vocab = (
        docs.filter(F.col("doc_id") < INCR_SPLIT)
        .select(F.explode(F.expr(toks)).alias("word"))
        .distinct()
        .withColumn("__known", F.lit(1))
    )
    eval_words = (
        docs.filter(F.col("doc_id") >= INCR_SPLIT)
        .select("source", F.explode(F.expr(toks)).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        eval_words.join(vocab, "word", "left")
        .groupBy("source")
        .agg(
            F.sum("cnt").alias("n_eval_tokens"),
            F.sum(
                F.when(F.col("__known").isNull(), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("n_oov_tokens"),
            F.count(F.lit(1)).alias("n_eval_types"),
            F.sum(
                F.when(F.col("__known").isNull(), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("n_oov_types"),
        )
        .selectExpr(
            "source",
            "n_eval_tokens",
            "n_oov_tokens",
            "cast(n_oov_tokens as double) / cast(n_eval_tokens as double)"
            " AS token_oov_rate",
            "n_eval_types",
            "n_oov_types",
            "cast(n_oov_types as double) / cast(n_eval_types as double)"
            " AS type_oov_rate",
        )
        .orderBy("source")
    )


VOCAB_OOV_SPLIT_SQL = f"""
WITH vocab AS (
  SELECT DISTINCT word FROM (
    SELECT unnest({duck_tokens("text")}) AS word
    FROM documents WHERE doc_id < {INCR_SPLIT}
  )
),
eval_words AS (
  SELECT source, word, count(*) AS cnt FROM (
    SELECT source, unnest({duck_tokens("text")}) AS word
    FROM documents WHERE doc_id >= {INCR_SPLIT}
  ) GROUP BY 1, 2
)
SELECT e.source,
       cast(sum(e.cnt) AS bigint) AS n_eval_tokens,
       cast(sum(CASE WHEN v.word IS NULL THEN e.cnt ELSE 0 END) AS bigint)
         AS n_oov_tokens,
       cast(sum(CASE WHEN v.word IS NULL THEN e.cnt ELSE 0 END) AS double)
         / cast(sum(e.cnt) AS double) AS token_oov_rate,
       count(*) AS n_eval_types,
       cast(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS bigint)
         AS n_oov_types,
       cast(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS double)
         / cast(count(*) AS double) AS type_oov_rate
FROM eval_words e LEFT JOIN vocab v ON e.word = v.word
GROUP BY e.source
ORDER BY e.source
"""


OOV_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "vocab_oov_split": vocab_oov_split,
}

OOV_ORACLES: dict[str, str] = {
    "vocab_oov_split": VOCAB_OOV_SPLIT_SQL,
}
