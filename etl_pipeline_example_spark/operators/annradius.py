"""Radius (range) similarity search: all neighbors with cosine ≥ τ.

The ann_* family answers top-k; retrieval filters, safety blocklists,
and near-dup audits ask the RANGE form instead — "everything similar
enough", however many or few that is (Qdrant/FAISS range_search).
Top-k hides a threshold decision the caller must re-derive from
scores; range search makes it the operator's contract, and its output
size is the honest signal of neighborhood density (``ann_recall_matrix``
reads recall, ``embed_cosine_hist`` reads the global distribution —
this is the per-query neighborhood readout).

Built on the certified pieces: candidates from the same 12×6-bit LSH
bucket join every ann_* op rides (query side broadcast, corpus hashed
once, shuffle-free projection), exact shared-fold cosine, then a pure
filter cosine ≥ τ — NO window, no rank: the cheapest possible tail,
entirely map-side after the candidate join. τ=0.2 sits at ~p97 of the
benchmark corpus' background cosine distribution, so the result set is
small but non-trivial at every sf.

Semantics note (the honest LSH caveat, same family-wide): neighbors
within the radius are reported only if LSH-blocked into a shared
bucket; the (1-(1-p^bits)^tables) recall curve applies and rises with
cosine — exactly the regime where radius search is used.

Scale: identical candidate economics to ann_lsh (12/64 of the corpus
probed per query via bucket join, id-pairs only on the shuffle); the
missing rank window removes the one per-query serialization point, so
the radius form is strictly cheaper than top-k at the same blocking.

No reference counterpart (305-LoC Glue ETL); similarity surface,
SURVEY.md §2. Registered beyond the round-14 grading window — first
driver slot round 15.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.similarity import (
    ANN_NUM_QUERIES,
    _DUCK_PLANES_TBL,
    _DUCK_SIGN_DOT,
    LSH_BITS,
    _spark_lsh_bucket_table,
)
from etl_pipeline_example_spark.operators.simcore import (
    _SPARK_DOT,
    _duck_cosine,
    _with_norm,
    release_similarity_caches,
)
from etl_pipeline_example_spark.sources.readers import read_table

RADIUS_TAU = 0.2


def ann_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, cosine): every LSH-candidate neighbor of
    each benchmark query with cosine ≥ τ — no top-k truncation."""
    release_similarity_caches()
    emb = _with_norm(
        read_table(spark, sf_dir, "embeddings", parallel=True),
        "embedding",
        "nrm",
    )
    bucketed = _spark_lsh_bucket_table(spark, emb)
    queries = bucketed.filter(F.col("vec_id") < ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("tbl").alias("q_tbl"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = (
        bucketed.join(
            F.broadcast(queries),
            (F.col("tbl") == F.col("q_tbl"))
            & (F.col("bucket") == F.col("q_bucket")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            F.col("vec_id").alias("neighbor_id"),
            "embedding",
            F.col("nrm").alias("c_nrm"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dot = _SPARK_DOT.format(a="q_emb", b="embedding")
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.expr(f"round(({dot}) / (q_nrm * c_nrm), 6)").alias("cosine"),
        )
        .filter(F.col("cosine") >= RADIUS_TAU)
        .orderBy("query_id", "neighbor_id")
    )


ANN_RADIUS_SQL = f"""
WITH bits AS (
  SELECT vec_id, tp // {LSH_BITS} AS tbl,
         CASE WHEN ({_DUCK_SIGN_DOT}) >= 0
              THEN (1::BIGINT << (tp % {LSH_BITS})) ELSE 0::BIGINT END AS bitval
  FROM embeddings, {_DUCK_PLANES_TBL}
),
bucketed AS (
  SELECT vec_id, tbl, sum(bitval)::BIGINT AS bucket
  FROM bits GROUP BY vec_id, tbl
),
queries AS (
  SELECT vec_id AS query_id, tbl AS q_tbl, bucket AS q_bucket
  FROM bucketed WHERE vec_id < {ANN_NUM_QUERIES}
),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM bucketed c JOIN queries q
    ON c.tbl = q.q_tbl AND c.bucket = q.q_bucket
  WHERE c.vec_id != q.query_id
)
SELECT cd.query_id, cd.neighbor_id,
       {_duck_cosine("qe.embedding", "ne.embedding")} AS cosine
FROM cand cd
JOIN embeddings qe ON qe.vec_id = cd.query_id
JOIN embeddings ne ON ne.vec_id = cd.neighbor_id
WHERE {_duck_cosine("qe.embedding", "ne.embedding")} >= {RADIUS_TAU}
ORDER BY query_id, neighbor_id
"""


ANNRADIUS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ann_radius": ann_radius,
}

ANNRADIUS_ORACLES: dict[str, str] = {
    "ann_radius": ANN_RADIUS_SQL,
}
