"""Dataset card: the one-page corpus summary grid, as a query.

Every released training corpus ships a data card; the numbers on it
are exactly the scalars this entry computes in ONE pass + one dedup
census: volume (docs, sources, languages, tokens, chars), shape (mean
doc tokens, empty-doc share), composition (non-English share, top
source share), and integrity (exact-duplicate rate over the shared
content hash — the same md5 construct dedup_exact keys on, so card
and dedup agree by construction).

Output is a tall (metric, value) grid — scalar doubles, one row per
metric — so downstream diffing ("did the card change between corpus
versions?") is a trivial join, and the driver's row-hash compare
works without struct flattening.

Exactness: counts and sums are integers; every ratio is one int/int
double division. Top-source share uses max-of-counts (comparison,
not ordering).

Scale: two map-side-combined aggregates over the corpus (the scalar
pass and the (hash) dedup census) plus a sources-bounded max — no
window, no sort, no text shuffle (the dedup census shuffles 60-bit
hashes).

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md
§2. Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    duck_tokens,
    spark_hexint,
    spark_tokens,
)
from etl_pipeline_example_spark.sources.readers import read_table


def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(metric, value): the corpus data-card scalars."""
    toks = spark_tokens("text")
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    scalars = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("count(distinct source)").alias("n_sources"),
        F.expr("count(distinct lang)").alias("n_langs"),
        F.expr(f"sum(size({toks}))").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.expr(
            "sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)"
        ).alias("n_empty"),
        F.expr(
            "sum(CASE WHEN lang != 'en' THEN 1 ELSE 0 END)"
        ).alias("n_non_en"),
    )
    dup = (
        docs.groupBy(F.expr(spark_hexint("text")).alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum("cnt").alias("total"),
            F.expr("sum(cnt - 1)").alias("n_dup_rows"),
        )
    )
    top_src = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.max("cnt").alias("top_source_docs"))
    )
    wide = scalars.crossJoin(F.broadcast(dup)).crossJoin(
        F.broadcast(top_src)
    )
    metrics = [
        ("n_docs", "cast(n_docs as double)"),
        ("n_sources", "cast(n_sources as double)"),
        ("n_langs", "cast(n_langs as double)"),
        ("n_tokens", "cast(n_tokens as double)"),
        ("n_chars", "cast(n_chars as double)"),
        ("mean_doc_tokens", "cast(n_tokens as double) / cast(n_docs as double)"),
        ("empty_doc_share", "cast(n_empty as double) / cast(n_docs as double)"),
        ("non_en_share", "cast(n_non_en as double) / cast(n_docs as double)"),
        ("exact_dup_rate", "cast(n_dup_rows as double) / cast(total as double)"),
        ("top_source_share", "cast(top_source_docs as double) / cast(n_docs as double)"),
    ]
    stack = ", ".join(f"'{m}', {e}" for m, e in metrics)
    return (
        wide.selectExpr(
            f"stack({len(metrics)}, {stack}) AS (metric, value)"
        )
        .orderBy("metric")
    )


def _card_sql() -> str:
    toks = duck_tokens("text")
    metrics = [
        ("n_docs", "cast(n_docs as double)"),
        ("n_sources", "cast(n_sources as double)"),
        ("n_langs", "cast(n_langs as double)"),
        ("n_tokens", "cast(n_tokens as double)"),
        ("n_chars", "cast(n_chars as double)"),
        ("mean_doc_tokens", "cast(n_tokens as double) / cast(n_docs as double)"),
        ("empty_doc_share", "cast(n_empty as double) / cast(n_docs as double)"),
        ("non_en_share", "cast(n_non_en as double) / cast(n_docs as double)"),
        ("exact_dup_rate", "cast(n_dup_rows as double) / cast(total as double)"),
        ("top_source_share", "cast(top_source_docs as double) / cast(n_docs as double)"),
    ]
    rows = "\nUNION ALL\n".join(
        f"SELECT '{m}' AS metric, {e} AS value FROM wide" for m, e in metrics
    )
    return f"""
WITH scalars AS (
  SELECT count(*) AS n_docs,
         count(DISTINCT source) AS n_sources,
         count(DISTINCT lang) AS n_langs,
         cast(sum(len({toks})) AS bigint) AS n_tokens,
         cast(sum(n_chars) AS bigint) AS n_chars,
         cast(sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)
              AS bigint) AS n_empty,
         cast(sum(CASE WHEN lang != 'en' THEN 1 ELSE 0 END) AS bigint)
           AS n_non_en
  FROM documents
),
dup AS (
  SELECT cast(sum(cnt) AS bigint) AS total,
         cast(sum(cnt - 1) AS bigint) AS n_dup_rows
  FROM (
    SELECT {duck_hexint("text")} AS h, count(*) AS cnt
    FROM documents GROUP BY 1
  )
),
top_src AS (
  SELECT max(cnt) AS top_source_docs FROM (
    SELECT source, count(*) AS cnt FROM documents GROUP BY 1
  )
),
wide AS (SELECT * FROM scalars CROSS JOIN dup CROSS JOIN top_src)
{rows}
ORDER BY metric
"""


DATASET_CARD_SQL = _card_sql()


DATACARD_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dataset_card": dataset_card,
}

DATACARD_ORACLES: dict[str, str] = {
    "dataset_card": DATASET_CARD_SQL,
}
