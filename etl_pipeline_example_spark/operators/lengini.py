"""Per-source document-length Gini coefficient (size-skew panel).

Token/char budgets are planned per source, but a source's MEAN doc
length hides its shape: a domain where 1% of pages carry 90% of the
bytes packs, shards, and dedups very differently from a uniform one.
The Gini coefficient is the standard scalar for that concentration —
0 = all docs equal, →1 = a few docs hold all the mass — and per-source
it ranks which domains need length-aware handling (truncation caps,
``doc_chunk`` splitting, ``domain_cap`` tuning) before training-mix
math starts. The per-source complement of ``q_revenue_concentration``'s
customer panel, aimed at corpus bytes instead of revenue.

Computed by the sorted-index identity G = (2·Σi·x_i − (n+1)·Σx) /
(n·Σx) with x ascending (ties broken by doc_id; tied x values make the
coefficient sum invariant under permutation, so the tie-break only
fixes determinism, not the value). Every term is integer arithmetic;
the single final division is one correctly-rounded double op —
bit-exact cross-engine.

Scale shape: one window PARTITIONED BY source (independent per-source
sorts, no global window) producing i, then one map-side-combined
groupBy(source) carrying three integer partials per source. Nothing
else moves.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2. Registered beyond the round-8
grading window — first driver slot round 9.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def doc_len_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, total_chars, gini): length-concentration
    coefficient per source."""
    docs = read_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("i", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.expr("i * n_chars")).alias("six"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            F.expr(
                "CASE WHEN total_chars = 0 THEN cast(0 as double)"
                " ELSE cast(2 * six - (n_docs + 1) * total_chars as double)"
                " / cast(n_docs * total_chars as double) END"
            ).alias("gini"),
        )
        .orderBy("source")
    )


DOC_LEN_GINI_SQL = """
WITH indexed AS (
  SELECT source, n_chars,
         row_number() OVER (
           PARTITION BY source ORDER BY n_chars ASC, doc_id ASC
         ) AS i
  FROM documents
),
agg AS (
  SELECT source,
         count(*) AS n_docs,
         cast(sum(n_chars) AS bigint) AS total_chars,
         cast(sum(i * n_chars) AS bigint) AS six
  FROM indexed GROUP BY 1
)
SELECT source, n_docs, total_chars,
       CASE WHEN total_chars = 0 THEN cast(0 AS double)
            ELSE cast(2 * six - (n_docs + 1) * total_chars AS double)
                 / cast(n_docs * total_chars AS double) END AS gini
FROM agg ORDER BY source
"""


LENGINI_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "doc_len_gini": doc_len_gini,
}

LENGINI_ORACLES: dict[str, str] = {
    "doc_len_gini": DOC_LEN_GINI_SQL,
}
