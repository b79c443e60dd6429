"""Hashed linear text classifier (fastText-shaped quality scoring).

Production corpus curation gates documents with a linear classifier
over hashed bag-of-words features (fastText: Joulin et al. 2016;
the CCNet / LLaMA "Wikipedia-reference" quality filter is exactly this
shape). The expensive part at 100 TB is NOT the model — it is streaming
every token through `score += W[hash(token) % B]`. This operator
implements that hot path with a deterministic hash-derived weight
table, so the plan shape, cost, and parallelism are identical to a
production scorer while the scores stay engine-exact:

    w(term) = (h60(md5('qw:' || term)) % 1001) - 500   ∈ [-500, 500]
    score(doc) = Σ_occurrences w(term)      (exact BIGINT arithmetic)
    keep(doc)  = score > 0

Swapping in trained weights is a broadcast join against a (B)-row
weight table — the plan is unchanged; the hash-derived form keeps the
oracle exact (no float dot products, no library-dependent transcendental
calls — the cross-engine exactness rule this repo's oracles follow).

Scale shape: tokenize → explode → per-token weight (pure expression,
whole-stage codegen) → groupBy(doc_id) sum with map-side partial
combine. One corpus-linear pass, two narrow shuffle columns
(doc_id, weight); the text never shuffles. Bigram features (fastText's
second feature class) would add one more explode over zipped adjacent
tokens — same budget class.

No reference counterpart (reference: glue_jobs/example_job/job.py,
a 75-line SQL job); LLM-pipeline surface, SURVEY.md §2.
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

QL_BUCKETS = 1001  # odd weight-table size; weights span [-500, 500]
QL_SHIFT = (QL_BUCKETS - 1) // 2


def quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_terms, score, keep): hashed-BoW linear score per doc.
    Zero-token docs score (0, 0, keep=false)."""
    h = spark_hexint("concat('qw:', term)")
    w = f"{h} % {QL_BUCKETS} - {QL_SHIFT}"
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    scored = (
        docs.select(
            "doc_id", F.explode(F.expr(spark_tokens("text"))).alias("term")
        )
        .select("doc_id", F.expr(w).alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("w").alias("score"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.expr("coalesce(n_terms, 0L)").alias("n_terms"),
            F.expr("coalesce(score, 0L)").alias("score"),
            F.expr("coalesce(score, 0L) > 0").alias("keep"),
        )
    )


QUALITY_LINEAR_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({duck_tokens("text")}) AS term FROM documents
),
scored AS (
  SELECT doc_id,
         count(*) AS n_terms,
         sum({duck_hexint("concat('qw:', term)")} % {QL_BUCKETS} - {QL_SHIFT})
           AS score
  FROM tok GROUP BY 1
)
SELECT d.doc_id,
       cast(coalesce(s.n_terms, 0) AS bigint) AS n_terms,
       cast(coalesce(s.score, 0) AS bigint) AS score,
       coalesce(s.score, 0) > 0 AS keep
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


QLINEAR_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "quality_linear": quality_linear,
}

QLINEAR_ORACLES: dict[str, str] = {
    "quality_linear": QUALITY_LINEAR_SQL,
}
