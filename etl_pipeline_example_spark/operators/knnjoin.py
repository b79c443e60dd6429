"""k-NN self-join: every vector's k nearest neighbors, LSH-blocked.

The ann_* family answers "top-k for THESE queries" (a handful of probe
vectors); semantic clustering, graph building (HNSW/NN-descent seeds),
and diversity analysis need the SELF-join form — top-k for EVERY
vector — where brute force is N² and the standard scale path is
block-by-LSH-bucket, score exactly within blocks, top-k per vector.

Built from the certified pieces, not re-derived: candidates come from
``lsh_candidate_pairs`` (operators/similarity.py — the exact
cross-engine random-hyperplane construction every embedding dedup op
rides, 12 tables × 6 bits: the ann_lsh occupancy regime, ~12/64 of the
corpus probed per vector), scoring is the shared deterministic-fold
cosine, and the per-vector top-k is a rank window over (cosine DESC,
neighbor id) — a WindowGroupLimit, never a global sort.

Semantics note (the honest LSH caveat, same as ann_lsh): neighbors are
the k nearest CANDIDATES; recall against brute force is the measured
(1-(1-p^bits)^tables) curve. The oracle mirrors the blocking, so the
driver grades the implementation, not the recall.

Scale shape: corpus hashed once against the broadcast plane table
(shuffle-free projection); only id-pairs ride the candidate shuffle
(vectors re-join for scoring); the window partitions by vector id.

No reference counterpart (305-LoC Glue ETL); similarity surface,
SURVEY.md §2. Registered beyond the round-12 grading window — first
driver slot round 13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.similarity import (
    LSH_BITS,
    LSH_TABLES,
    _DUCK_PLANES_TBL,
    _DUCK_SIGN_DOT,
    lsh_candidate_pairs,
)
from etl_pipeline_example_spark.operators.simcore import (
    _SPARK_DOT,
    _duck_cosine,
    _with_norm,
    release_similarity_caches,
    tracked_persist,
)
from etl_pipeline_example_spark.sources.readers import read_table

KNN_K = 5


def ann_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, neighbor_id, cosine, rank): each vector's top-5
    LSH-candidate neighbors by exact cosine."""
    release_similarity_caches()
    emb = tracked_persist(
        _with_norm(
            read_table(spark, sf_dir, "embeddings", parallel=True),
            "embedding",
            "nrm",
        )
    )
    dp = spark.sparkContext.defaultParallelism
    pairs = lsh_candidate_pairs(spark, emb, LSH_TABLES, LSH_BITS)
    # symmetrize: each unordered candidate pair serves both endpoints.
    # repartition(dp, key) at each join head bounds the shuffle width
    # (vanilla 200-wide exchanges over narrow id-pair frames are pure
    # overhead), and the vec_id partitioning carries through the second
    # join into the rank window — one exchange serves both.
    sym = pairs.select(
        F.col("vec_a").alias("vec_id"), F.col("vec_b").alias("neighbor_id")
    ).unionAll(
        pairs.select(
            F.col("vec_b").alias("vec_id"),
            F.col("vec_a").alias("neighbor_id"),
        )
    )
    x = emb.select(
        F.col("vec_id").alias("__sid"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    y = emb.select(
        F.col("vec_id").alias("__nid"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = _SPARK_DOT.format(a="ea", b="eb")
    scored = (
        sym.repartition(dp, "neighbor_id")
        .join(y.repartition(dp, "__nid"), F.col("neighbor_id") == F.col("__nid"))
        .repartition(dp, "vec_id")
        .join(x.repartition(dp, "__sid"), F.col("vec_id") == F.col("__sid"))
        .select(
            "vec_id",
            "neighbor_id",
            F.expr(f"round(({dot}) / (na * nb), 6)").alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= KNN_K
    )


ANN_KNN_JOIN_SQL = f"""
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
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bucketed a JOIN bucketed b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
sym AS (
  SELECT vec_a AS vec_id, vec_b AS neighbor_id FROM cand
  UNION ALL
  SELECT vec_b AS vec_id, vec_a AS neighbor_id FROM cand
),
scored AS (
  SELECT s.vec_id, s.neighbor_id,
         {_duck_cosine("x.embedding", "y.embedding")} AS cosine
  FROM sym s
  JOIN embeddings x ON x.vec_id = s.vec_id
  JOIN embeddings y ON y.vec_id = s.neighbor_id
)
SELECT vec_id, neighbor_id, cosine, rank FROM (
  SELECT vec_id, neighbor_id, cosine,
         cast(row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, neighbor_id) AS int) AS rank
  FROM scored
) WHERE rank <= {KNN_K}
"""


KNNJOIN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ann_knn_join": ann_knn_join,
}

KNNJOIN_ORACLES: dict[str, str] = {
    "ann_knn_join": ANN_KNN_JOIN_SQL,
}
