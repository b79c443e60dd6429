"""Tokenizer fertility: BPE efficiency per corpus source.

The metric every tokenizer evaluation reports: how many BPE tokens a
word costs (``tokens_per_word``, fertility proper) and how many
characters each token covers (``chars_per_token``), sliced by source —
the number that says WHICH slice of a mixed corpus the vocabulary
serves poorly (code-ish sources fragment, prose compresses). Composes
the frozen ``bpe_encode`` (operators/bpe.py:106 — imported, never
restated; the oracle nests the registered encode SQL as a CTE, so both
sides tokenize with the SAME learned merges).

Exactness: token/word/char tallies are integer sums; the two ratios
are single int/int double divisions.

Scale: everything corpus-sized is inside bpe_encode's already-audited
plan (vocabulary-side merges, map-side per-doc aggregate); this layer
adds one broadcast-sized join key (doc_id → source via the documents
scan) and a ≤|sources| aggregate.

Reference: N/A (305-LoC Glue ETL has no text surface); LLM-pipeline
surface, SURVEY.md §2. Registered beyond the round-10 grading window —
first driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.bpe import BPE_ENCODE_SQL, bpe_encode
from etl_pipeline_example_spark.sources.readers import read_table


def bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_words, n_bpe_tokens, tokens_per_word,
    chars_per_token): per-source tokenizer fertility."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    enc = bpe_encode(spark, sf_dir)
    return (
        docs.join(enc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
            F.expr(
                "cast(sum(n_bpe_tokens) as double)"
                " / cast(sum(n_words) as double)"
            ).alias("tokens_per_word"),
            F.expr(
                "cast(sum(n_chars) as double)"
                " / cast(sum(n_bpe_tokens) as double)"
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )


BPE_FERTILITY_SQL = f"""
WITH enc AS ({BPE_ENCODE_SQL}),
joined AS (
  SELECT d.source, d.n_chars, e.n_words, e.n_bpe_tokens
  FROM documents d JOIN enc e ON d.doc_id = e.doc_id
)
SELECT source, count(*) AS n_docs,
       cast(sum(n_words) AS bigint) AS n_words,
       cast(sum(n_bpe_tokens) AS bigint) AS n_bpe_tokens,
       cast(sum(n_bpe_tokens) AS double) / cast(sum(n_words) AS double)
         AS tokens_per_word,
       cast(sum(n_chars) AS double) / cast(sum(n_bpe_tokens) AS double)
         AS chars_per_token
FROM joined
GROUP BY source
ORDER BY source
"""


FERTILITY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bpe_fertility": bpe_fertility,
}

FERTILITY_ORACLES: dict[str, str] = {
    "bpe_fertility": BPE_FERTILITY_SQL,
}
