"""Embedding-truncation design table (Matryoshka-style dim/recall curve).

Matryoshka representation learning (Kusupati et al. 2022) made
PREFIX-TRUNCATED embeddings the standard cheap-retrieval lever: store
the full vector once, rank with the first d dims, and spend the saved
compute on more candidates. Before committing a pipeline to a
truncation dim, the owner reads exactly this table: recall@K of
truncated-cosine ranking against the full-dim exact ranking, per
candidate dim. The same design-table discipline as ``minhash_tune``
(LSH S-curve) and ``minhash_calibration`` (sketch trust).

Exactness: every score is the repo's shared left-to-right fold dot
product (`simcore._SPARK_DOT` / `_DUCK_DOT` — identical order in both
engines, bit-exact); recall is an integer hit count with the one
derived rounded double. The full-dim row (d = 64) is the recall-1.0
anchor by construction.

Scale shape: ONE corpus × broadcast-queries pass computes all
truncated scores (a stack of per-dim projections over the same row —
no repeated scans); per-dim rankings are query-partitioned windows
over corpus-sized frames; the hit join is top-K × top-K per query.
At 100 TB the corpus pass dominates and it is exactly one scan.

No reference counterpart (reference: glue_jobs/example_job/job.py);
LLM-pipeline surface, SURVEY.md §2. Registered beyond the round-7/8
grading windows — first driver slot in round 9.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.simcore import (
    ANN_K,
    ANN_NUM_QUERIES,
    _DUCK_DOT,
    _SPARK_DOT,
    release_similarity_caches,
    tracked_persist,
)
from etl_pipeline_example_spark.sources.readers import read_table

TRUNC_DIMS = (4, 8, 16, 32, 64)  # 64 = full width: the recall-1.0 anchor


def _spark_trunc_cos(d: int) -> str:
    a, b = f"slice(q_emb, 1, {d})", f"slice(c_emb, 1, {d})"
    dot = _SPARK_DOT.format(a=a, b=b)
    na = _SPARK_DOT.format(a=a, b=a)
    nb = _SPARK_DOT.format(a=b, b=b)
    return f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"


def embed_trunc_tune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dim, n_hits, n_possible, recall_at_k): truncated-ranking recall
    against the full-dim exact top-K, over the standard query set."""
    release_similarity_caches()
    emb = read_table(spark, sf_dir, "embeddings", parallel=True)
    queries = emb.filter(F.col("vec_id") < ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    stack = ", ".join(f"{d}, {_spark_trunc_cos(d)}" for d in TRUNC_DIMS)
    scored = tracked_persist(
        corpus.join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"stack({len(TRUNC_DIMS)}, {stack}) AS (dim, score)",
        )
    )
    w = Window.partitionBy("dim", "query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= ANN_K
    )
    truth = topk.filter(F.col("dim") == TRUNC_DIMS[-1]).select(
        "query_id", "neighbor_id"
    )
    hits = (
        topk.join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("dim")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    # left join from the dim grid: a width with ZERO overlap must report
    # recall 0.0, not vanish from the design table
    dims = spark.createDataFrame([(d,) for d in TRUNC_DIMS], "dim int")
    n_possible = ANN_K * ANN_NUM_QUERIES
    return (
        dims.join(hits, "dim", "left")
        .select(
            "dim",
            F.expr("coalesce(n_hits, 0L)").alias("n_hits"),
            F.lit(n_possible).cast("bigint").alias("n_possible"),
            F.expr(
                f"round(cast(coalesce(n_hits, 0L) as double)"
                f" / cast({n_possible} as double), 6)"
            ).alias("recall_at_k"),
        )
        .orderBy("dim")
    )


def _duck_trunc_cos(d: int) -> str:
    a, b = f"(q.q_emb[1:{d}])", f"(c.c_emb[1:{d}])"
    dot = _DUCK_DOT.format(a=a, b=b)
    na = _DUCK_DOT.format(a=a, b=a)
    nb = _DUCK_DOT.format(a=b, b=b)
    return f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"


_DUCK_SCORED = " UNION ALL ".join(
    f"SELECT q.query_id, c.neighbor_id, {d} AS dim, {_duck_trunc_cos(d)} AS score"
    " FROM corpus c, queries q WHERE c.neighbor_id != q.query_id"
    for d in TRUNC_DIMS
)

EMBED_TRUNC_TUNE_SQL = f"""
WITH queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {ANN_NUM_QUERIES}
),
corpus AS (
  SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings
),
scored AS (
  {_DUCK_SCORED}
),
topk AS (
  SELECT dim, query_id, neighbor_id FROM (
    SELECT dim, query_id, neighbor_id,
           row_number() OVER (PARTITION BY dim, query_id
                              ORDER BY score DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= {ANN_K}
),
truth AS (
  SELECT query_id, neighbor_id FROM topk WHERE dim = {TRUNC_DIMS[-1]}
),
hits AS (
  SELECT t.dim, count(*) AS n_hits
  FROM topk t
  JOIN truth u ON u.query_id = t.query_id AND u.neighbor_id = t.neighbor_id
  GROUP BY t.dim
)
SELECT d.dim,
       cast(coalesce(h.n_hits, 0) AS bigint) AS n_hits,
       cast({ANN_K * ANN_NUM_QUERIES} AS bigint) AS n_possible,
       round(cast(coalesce(h.n_hits, 0) AS double)
             / cast({ANN_K * ANN_NUM_QUERIES} AS double), 6) AS recall_at_k
FROM (VALUES {", ".join(f"({d})" for d in TRUNC_DIMS)}) AS d(dim)
LEFT JOIN hits h ON h.dim = d.dim
ORDER BY d.dim
"""


TRUNCTUNE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embed_trunc_tune": embed_trunc_tune,
}

TRUNCTUNE_ORACLES: dict[str, str] = {
    "embed_trunc_tune": EMBED_TRUNC_TUNE_SQL,
}
