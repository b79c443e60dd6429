"""Per-source readability / lexical-complexity panel.

Classic readability scores (Flesch, LIX, RIX) decompose into three
exact counts — words, "long" words (≥ ``LONG_LEN`` chars, the LIX
definition), and syllables (approximated by vowel-group runs, the
standard heuristic when no dictionary is available) — plus ratios of
those counts. This panel aggregates the counts per source and derives
the ratios, giving a corpus-curation view of lexical complexity by
source (feed into ``mix_weights`` / ``quality_buckets`` decisions).

Exactness: the three counts are integers (token splits and regexp
matches agree across engines — the ``text_quality`` precedent); the
derived ratios are single IEEE-double divisions of those integers,
which both engines round identically (no transcendental functions, no
literal-decimal arithmetic — the round-5 exactness rules).

Scale shape: one documents scan; per-doc counts are scalar expressions
in whole-stage codegen; ONE map-side-combined groupBy(source) shuffle
carrying 4 longs per doc. No joins, no second pass.

Sentence-based terms (words/sentence) are deliberately absent: the
synthetic corpus has no sentence punctuation, and on a real corpus the
sentence splitter would be a parameter — the panel exposes the raw
counts so any score variant composes downstream.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens
from etl_pipeline_example_spark.sources.readers import read_table

LONG_LEN = 6  # LIX's long-word threshold


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_words, n_long_words, n_syllables,
    words_per_doc, long_word_share, syllables_per_word) per source."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    toks = spark_tokens("text")
    per_doc = docs.select(
        "source",
        F.expr(f"size({toks})").alias("nw"),
        F.expr(f"size(filter({toks}, w -> length(w) >= {LONG_LEN}))").alias("nl"),
        F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))").alias("ns"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nw").alias("n_words"),
            F.sum("nl").alias("n_long_words"),
            F.sum("ns").alias("n_syllables"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_long_words",
            "n_syllables",
            F.expr("cast(n_words as double) / cast(n_docs as double)").alias(
                "words_per_doc"
            ),
            F.expr("cast(n_long_words as double) / cast(n_words as double)").alias(
                "long_word_share"
            ),
            F.expr("cast(n_syllables as double) / cast(n_words as double)").alias(
                "syllables_per_word"
            ),
        )
        .orderBy("source")
    )


TEXT_READABILITY_SQL = f"""
WITH per_doc AS (
  SELECT source,
         len({duck_tokens("text")}) AS nw,
         len(list_filter({duck_tokens("text")}, w -> len(w) >= {LONG_LEN})) AS nl,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS ns
  FROM documents
),
agg AS (
  SELECT source,
         count(*) AS n_docs,
         cast(sum(nw) as bigint) AS n_words,
         cast(sum(nl) as bigint) AS n_long_words,
         cast(sum(ns) as bigint) AS n_syllables
  FROM per_doc GROUP BY source
)
SELECT source, n_docs, n_words, n_long_words, n_syllables,
       cast(n_words as double) / cast(n_docs as double) AS words_per_doc,
       cast(n_long_words as double) / cast(n_words as double) AS long_word_share,
       cast(n_syllables as double) / cast(n_words as double) AS syllables_per_word
FROM agg ORDER BY source
"""


READABILITY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_readability": text_readability,
}

READABILITY_ORACLES: dict[str, str] = {
    "text_readability": TEXT_READABILITY_SQL,
}
