"""Character-trigram language profile: top trigrams per labeled lang.

The feature-engineering layer UNDER a language identifier: real
langid models (textcat-style) rank character n-grams per language and
match documents against the profiles. This operator builds that
profile table from the labeled corpus — the top ``TOP_N`` lowercase
character trigrams per language by total occurrences, deterministically
ranked (count DESC, trigram ASC).

Trigram extraction is pure codegen on both sides: a positional
``transform(sequence(...))`` over the lowered text (guarded —
``sequence(1, 0)`` DESCENDS in Spark, so texts under 3 chars emit an
empty array, never a reversed range), exploded and counted. No Python
in the loop.

Exactness: counts are integers; ``occ_share`` (trigram occurrences /
language total) is one int/int double division.

Scale: the explode is linear in corpus characters (the same cost class
as tokenization — unavoidable for any n-gram profile) and feeds ONE
map-side-combined groupBy (lang, trigram); the rank window partitions
are bounded by distinct trigrams per language (≤ charset³, corpus-
independent), and the per-lang totals join is broadcast-sized.

Reference: N/A (305-LoC Glue ETL has no text surface); LLM-pipeline
surface, SURVEY.md §2. Registered beyond the round-10 grading window —
first driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_example_spark.sources.readers import read_table
from etl_pipeline_example_spark.operators.simcore import (
    release_similarity_caches,
    tracked_persist,
)

TOP_N = 5

_SPARK_TRIGRAMS = (
    "CASE WHEN length(lower(text)) >= 3 THEN"
    " transform(sequence(1, length(lower(text)) - 2),"
    " i -> substring(lower(text), i, 3))"
    " ELSE array() END"
)
# DuckDB range(a, b) is exclusive-upper and empty when b <= a, so the
# short-text guard is the greatest() clamp
_DUCK_TRIGRAMS = (
    "[substr(lower(text), i, 3)"
    " for i in range(1, greatest(length(lower(text)) - 1, 1))]"
)


def ngram_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, trigram, n_occ, rnk, occ_share): the top-5 character
    trigrams per labeled language."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    release_similarity_caches()
    # persisted: the rank window AND the per-lang totals both consume
    # counts — one trigram-explode pass instead of two
    counts = tracked_persist(
        docs.select(
            "lang",
            F.explode(F.expr(_SPARK_TRIGRAMS)).alias("trigram"),
        )
        .groupBy("lang", "trigram")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    totals = counts.groupBy("lang").agg(F.sum("n_occ").alias("n_lang"))
    w = Window.partitionBy("lang").orderBy(F.desc("n_occ"), "trigram")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(f"rnk <= {TOP_N}")
        .join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "trigram",
            "n_occ",
            "rnk",
            F.expr(
                "cast(n_occ as double) / cast(n_lang as double)"
            ).alias("occ_share"),
        )
        .orderBy("lang", "rnk")
    )


NGRAM_LANG_PROFILE_SQL = f"""
WITH grams AS (
  SELECT lang, unnest({_DUCK_TRIGRAMS}) AS trigram
  FROM documents
),
counts AS (
  SELECT lang, trigram, count(*) AS n_occ
  FROM grams GROUP BY 1, 2
),
totals AS (
  SELECT lang, cast(sum(n_occ) AS bigint) AS n_lang
  FROM counts GROUP BY 1
),
ranked AS (
  SELECT lang, trigram, n_occ,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_occ DESC, trigram) AS rnk
  FROM counts
)
SELECT r.lang, r.trigram, r.n_occ, cast(r.rnk AS integer) AS rnk,
       cast(r.n_occ AS double) / cast(t.n_lang AS double) AS occ_share
FROM ranked r JOIN totals t ON r.lang = t.lang
WHERE r.rnk <= {TOP_N}
ORDER BY r.lang, r.rnk
"""


CHARTRIGRAM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ngram_lang_profile": ngram_lang_profile,
}

CHARTRIGRAM_ORACLES: dict[str, str] = {
    "ngram_lang_profile": NGRAM_LANG_PROFILE_SQL,
}
