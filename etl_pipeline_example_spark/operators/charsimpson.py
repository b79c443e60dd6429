"""Character-diversity quality gate: per-document Gini–Simpson index.

Low character diversity is a cheap, language-agnostic gibberish/
boilerplate signal ("aaaa…", padded repeats, single-char floods score
near 0; natural text sits high) — a standard pre-filter next to the
class-ratio gates (charstats) and the char-LM (charlm). Like
``q_user_diversity``, Shannon entropy is the textbook form but log()
is a library-ulp hazard, so the index is the log-free
1 − Σcᵢ²/n² over per-document character counts — pure integer sums
and one correctly-rounded division, bit-exact cross-engine.

Extraction is pure codegen: a guarded positional transform over the
lowered text (``sequence(1, 0)`` DESCENDS in Spark — sub-1-char texts
emit an empty array), exploded and counted; no Python anywhere.

Scale: the explode is linear in corpus characters (the tokenization
cost class); ONE map-side-combined groupBy (doc_id, ch) — per-doc
distinct chars ≤ charset, so the shuffle is charset-bounded per doc —
then a per-doc fold. Well-distributed composite keys, no windows.

Reference: N/A (305-LoC Glue ETL has no text surface); LLM-pipeline
surface, SURVEY.md §2. Registered beyond the round-10 grading window —
first driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

_SPARK_CHARS = (
    "CASE WHEN length(text) >= 1 THEN"
    " transform(sequence(1, length(text)),"
    " i -> substring(lower(text), i, 1))"
    " ELSE array() END"
)
_DUCK_CHARS = (
    "[substr(lower(text), i, 1)"
    " for i in range(1, greatest(length(text) + 1, 1))]"
)


def text_char_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars_counted, n_distinct_chars, simpson): per-doc
    character-level Gini–Simpson diversity."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    counts = (
        docs.select(
            "doc_id", F.explode(F.expr(_SPARK_CHARS)).alias("ch")
        )
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_chars_counted"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
            F.expr("sum(c * c)").alias("ssq"),
        )
        .select(
            "doc_id",
            "n_chars_counted",
            "n_distinct_chars",
            F.expr(
                "1.0D - cast(ssq as double)"
                " / (cast(n_chars_counted as double)"
                " * cast(n_chars_counted as double))"
            ).alias("simpson"),
        )
        .orderBy("doc_id")
    )


TEXT_CHAR_SIMPSON_SQL = f"""
WITH chars AS (
  SELECT doc_id, unnest({_DUCK_CHARS}) AS ch FROM documents
),
counts AS (
  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2
),
folded AS (
  SELECT doc_id,
         cast(sum(c) AS bigint) AS n_chars_counted,
         count(*) AS n_distinct_chars,
         cast(sum(c * c) AS bigint) AS ssq
  FROM counts GROUP BY 1
)
SELECT doc_id, n_chars_counted, n_distinct_chars,
       1.0 - cast(ssq AS double)
         / (cast(n_chars_counted AS double)
            * cast(n_chars_counted AS double)) AS simpson
FROM folded
ORDER BY doc_id
"""


CHARSIMPSON_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_char_simpson": text_char_simpson,
}

CHARSIMPSON_ORACLES: dict[str, str] = {
    "text_char_simpson": TEXT_CHAR_SIMPSON_SQL,
}
