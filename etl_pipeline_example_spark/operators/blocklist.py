"""Categorized blocklist gate — the C4 "badwords" filter mechanism.

C4's most famous (and most-debated) stage removes any document
containing a term from a blocklist; production curation generalizes it
to CATEGORIZED lexicons (profanity / unsafe / spam-markers) with
per-category counts, because the remediation differs — spam markers
route to a classifier, unsafe terms to human review, and the report of
WHAT fired is as important as the gate bit. This operator implements
that mechanism; the lexicon here is a neutral placeholder (three
categories of ordinary engine vocabulary so the gate demonstrably
fires on the synthetic corpus) — a deployment swaps in its real
list, the plan is unchanged.

Execution shape (the hot-path discipline): tokenize → explode → JOIN
against the BROADCAST lexicon table (never a literal indexed inside a
lambda — the measured 60-600× hazard) → per-doc conditional-aggregated
category counts → left join back so clean and zero-token docs report
zeros. Counting duplicates matters ("spam" once vs 40 times), so the
join is per-occurrence.

All counting — integer-exact; keep = no flagged occurrence at all
(the C4 contract).

Scale: one corpus-linear explode pass; the lexicon broadcast is
KB-sized; only (doc_id, category) rides the aggregation shuffle —
text never shuffles.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md
§2. Registered beyond the round-14 grading window — first driver slot
round 15.
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

# placeholder lexicon: (term, category) — swap for a real list in a
# deployment; chosen from corpus-frequent neutral vocabulary so the
# mechanism measurably fires on the synthetic testdata
BLOCKLIST: list[tuple[str, str]] = [
    ("slow", "quality"),
    ("broken", "quality"),
    ("stale", "quality"),
    ("spam", "spam"),
    ("click", "spam"),
    ("subscribe", "spam"),
    ("leak", "unsafe"),
    ("exploit", "unsafe"),
    ("crash", "unsafe"),
]
_CATS = ("quality", "spam", "unsafe")


def quality_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_terms, n_flagged, n_quality, n_spam, n_unsafe, keep):
    per-occurrence categorized blocklist hits; keep = zero hits."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    lex = F.broadcast(
        spark.createDataFrame(BLOCKLIST, "term string, category string")
    )
    tok = docs.select(
        "doc_id", F.explode(F.expr(spark_tokens("text"))).alias("term")
    )
    hits = (
        tok.join(lex, "term")
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(
                    F.expr(
                        f"CASE WHEN category = '{c}' THEN 1 ELSE 0 END"
                    )
                ).alias(f"n_{c}")
                for c in _CATS
            ]
        )
    )
    counts = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_terms"))
    return (
        docs.select("doc_id")
        .join(counts, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.expr("coalesce(n_terms, 0L)").alias("n_terms"),
            F.expr(
                "coalesce(n_quality, 0L) + coalesce(n_spam, 0L)"
                " + coalesce(n_unsafe, 0L)"
            ).alias("n_flagged"),
            *[
                F.expr(f"coalesce(n_{c}, 0L)").alias(f"n_{c}")
                for c in _CATS
            ],
            F.expr(
                "coalesce(n_quality, 0L) + coalesce(n_spam, 0L)"
                " + coalesce(n_unsafe, 0L) = 0"
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


_LEX_VALUES = ", ".join(f"('{t}', '{c}')" for t, c in BLOCKLIST)

QUALITY_BLOCKLIST_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({duck_tokens("text")}) AS term FROM documents
),
counts AS (
  SELECT doc_id, count(*)::BIGINT AS n_terms FROM tok GROUP BY 1
),
hits AS (
  SELECT t.doc_id,
         {", ".join(
             f"sum(CASE WHEN l.category = '{c}' THEN 1 ELSE 0 END)::BIGINT"
             f" AS n_{c}" for c in _CATS
         )}
  FROM tok t JOIN (VALUES {_LEX_VALUES}) l(term, category)
    ON t.term = l.term
  GROUP BY 1
)
SELECT d.doc_id,
       cast(coalesce(c.n_terms, 0) AS bigint) AS n_terms,
       cast(coalesce(h.n_quality, 0) + coalesce(h.n_spam, 0)
            + coalesce(h.n_unsafe, 0) AS bigint) AS n_flagged,
       cast(coalesce(h.n_quality, 0) AS bigint) AS n_quality,
       cast(coalesce(h.n_spam, 0) AS bigint) AS n_spam,
       cast(coalesce(h.n_unsafe, 0) AS bigint) AS n_unsafe,
       coalesce(h.n_quality, 0) + coalesce(h.n_spam, 0)
         + coalesce(h.n_unsafe, 0) = 0 AS keep
FROM documents d
LEFT JOIN counts c USING (doc_id)
LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
"""


BLOCKLIST_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "quality_blocklist": quality_blocklist,
}

BLOCKLIST_ORACLES: dict[str, str] = {
    "quality_blocklist": QUALITY_BLOCKLIST_SQL,
}
