"""Vocabulary growth curve (Heaps'-law probe): distinct words vs
corpus prefix.

The curation-planning readout: how fast does the vocabulary still grow
as the corpus grows? A flattening curve says more of the same source
adds tokens but no lexical novelty (deduplicate / diversify instead);
a steep curve says the corpus is still under-sampled. Measured at
fixed corpus fractions (by doc_id order — deterministic, not sampled):
for each cutoff, the number of documents and DISTINCT words within the
prefix.

Execution shape: ONE tokenize+explode pass; every fraction is a
conditional distinct over the same exploded frame
(``count(distinct CASE WHEN doc_id <= cutoff THEN word END)``), so
adding a curve point adds an aggregate expression, never a scan.
Cutoffs come from the max doc_id (one broadcast row), keeping the
operator scale-independent of how ids are assigned.

Exactness: integer counts only. Word tokenization is the suite's
shared cross-engine construct (operators/hashing.py).

Scale: Spark plans multi-distinct aggregates via Expand (×5 grouping
exprs) with map-side de-dup — the same honest cost class as
``q_distinct_cube`` and bounded by distinct-(cutoff, word) pairs, a
vocabulary-sized (Heaps-sublinear) shuffle, never corpus-sized.

Reference: N/A (305-LoC Glue ETL has no text surface); LLM-pipeline
surface, SURVEY.md §2. Registered beyond the round-10 grading window —
first driver slot round 11.
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

FRACTIONS = (20, 40, 60, 80, 100)  # percent of max doc_id


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pct, cutoff_doc, n_docs, distinct_words): the vocabulary growth
    curve at 20/40/60/80/100% corpus prefixes."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    words = docs.select(
        "doc_id", F.explode(F.expr(spark_tokens("text"))).alias("word")
    )
    mx = docs.agg(F.max("doc_id").alias("mx"))
    cond = words.crossJoin(F.broadcast(mx))
    aggs = []
    for pct in FRACTIONS:
        cut = f"(mx * {pct}) div 100"
        aggs.append(
            F.expr(
                f"count(distinct CASE WHEN doc_id <= {cut}"
                " THEN word END)"
            ).alias(f"w{pct}")
        )
        aggs.append(
            F.expr(
                f"count(distinct CASE WHEN doc_id <= {cut}"
                " THEN doc_id END)"
            ).alias(f"d{pct}")
        )
        aggs.append(F.expr(f"max({cut})").alias(f"c{pct}"))
    one = cond.agg(*aggs)
    stack_args = ", ".join(
        f"{pct}, c{pct}, d{pct}, w{pct}" for pct in FRACTIONS
    )
    return one.selectExpr(
        f"stack({len(FRACTIONS)}, {stack_args})"
        " AS (pct, cutoff_doc, n_docs, distinct_words)"
    ).orderBy("pct")


def _growth_sql() -> str:
    cells = []
    for pct in FRACTIONS:
        cut = f"(mx * {pct}) // 100"
        cells.append(
            f"count(distinct CASE WHEN doc_id <= {cut} THEN word END)"
            f" AS w{pct},"
            f" count(distinct CASE WHEN doc_id <= {cut} THEN doc_id END)"
            f" AS d{pct}, max({cut}) AS c{pct}"
        )
    cell_sql = ",\n         ".join(cells)
    rows = "\n  UNION ALL\n  ".join(
        f"SELECT {pct} AS pct, cast(c{pct} AS bigint) AS cutoff_doc,"
        f" cast(d{pct} AS bigint) AS n_docs,"
        f" cast(w{pct} AS bigint) AS distinct_words FROM one"
        for pct in FRACTIONS
    )
    return f"""
WITH words AS (
  SELECT doc_id, unnest({duck_tokens("text")}) AS word FROM documents
),
mxx AS (SELECT max(doc_id) AS mx FROM documents),
one AS (
  SELECT {cell_sql}
  FROM words CROSS JOIN mxx
)
SELECT pct, cutoff_doc, n_docs, distinct_words FROM (
  {rows}
)
ORDER BY pct
"""


VOCABGROWTH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "vocab_growth": vocab_growth,
}

VOCABGROWTH_ORACLES: dict[str, str] = {
    "vocab_growth": _growth_sql(),
}
