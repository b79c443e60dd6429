"""Filtered vector search: exact top-k under a metadata predicate.

The production ANN query is rarely unfiltered — it's "nearest neighbors
WITHIN the query's category" (same tenant, same language, same product
family). The classic failure mode is search-then-filter: take the
global top-k, then drop the wrong-label rows and under-return. The
correct shape is FILTER-THEN-SEARCH: apply the metadata predicate
before any distance is computed, so the top-k is exact within the
filtered set and every pruned row saves a dot product.

Here the predicate is label equality with the query (``embeddings``
carries the ``label`` column): the predicate rides IN the broadcast
join condition, so Catalyst evaluates it before the cosine expression
— a filtered scan, not a post-filter on scores (the ann_bruteforce
plan — operators/similarity.py:96 — with the filter pushed inside).

Exactness: the same shared cosine fragments every ANN entry uses
(6-dp-pinned rounding, id tiebreak); label equality is integer.

Scale: identical to ann_bruteforce — broadcast queries stream past the
corpus once — with the filter cutting the scored pair space by the
label selectivity (at K labels, ~1/K of the work); an IVF/LSH variant
composes the same predicate into its bucket probe unchanged.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.simcore import (
    ANN_K,
    ANN_NUM_QUERIES,
    _DUCK_DOT,
    _DUCK_SELF_NORM,
    _SPARK_DOT,
    _with_norm,
    release_similarity_caches,
)
from etl_pipeline_example_spark.sources.readers import read_table


def ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact cosine top-k among
    corpus vectors sharing the query's label."""
    release_similarity_caches()
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings", parallel=True),
        "embedding",
        "nrm",
    )
    queries = emb.filter(F.col("vec_id") < ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    dot = _SPARK_DOT.format(a="q_emb", b="c_emb")
    scored = (
        corpus.join(
            F.broadcast(queries),
            # the metadata predicate lives IN the join condition:
            # filter-then-search, never search-then-filter
            F.expr(
                "label = q_label AND neighbor_id != query_id"
            ),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.expr(f"round(({dot}) / (q_nrm * c_nrm), 6)").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= ANN_K
    )


ANN_FILTERED_SQL = f"""
WITH normed AS (
  SELECT vec_id, label, embedding, {_DUCK_SELF_NORM} AS nrm FROM embeddings
),
queries AS (
  SELECT vec_id AS query_id, label AS q_label, embedding AS q_emb,
         nrm AS q_nrm
  FROM normed WHERE vec_id < {ANN_NUM_QUERIES}
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(({_DUCK_DOT.format(a="q.q_emb", b="c.embedding")})
               / (q.q_nrm * c.nrm), 6) AS cosine
  FROM normed c JOIN queries q
    ON c.label = q.q_label AND c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
"""


ANNFILTERED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ann_filtered": ann_filtered,
}

ANNFILTERED_ORACLES: dict[str, str] = {
    "ann_filtered": ANN_FILTERED_SQL,
}
