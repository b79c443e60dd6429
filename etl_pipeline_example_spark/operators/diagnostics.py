"""Feature-space diagnostics: embedding dimensions and token lengths.

  embed_dim_stats  per-dimension mean and variance of the embedding
                   space — the quantizer-design diagnostic (dead
                   dimensions waste PQ subspaces; scale imbalance
                   breaks symmetric int8). Exact-decimal power sums
                   (the q_stats discipline: order-independent, both
                   engines sum identical decimals) with the variance
                   assembled on the driver-free double side.
  token_len_hist   token-length histogram over the corpus — the
                   tokenizer diagnostic (long-tail lengths say whether
                   byte-fallback or length caps are needed before BPE).
                   One explode + a length-bounded aggregate.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 rows 27n and 30c.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens
from etl_pipeline_example_spark.sources.readers import read_table


def embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dim, n, mean, variance): 1-indexed per-dimension moments.

    Scale shape: one explode to (dim, value) — dims-bounded groups
    after the map-side combine — with Σx and Σx² as exact decimal sums
    of 12-dp-rounded values (order-independent: decimal addition
    commutes exactly, so partition order cannot shift the result);
    mean and variance are assembled from the exact sums with single
    double divisions, 6-dp pinned.
    """
    emb = read_table(spark, sf_dir, "embeddings", parallel=True)
    vals = emb.select(
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " v -> cast(round(cast(v as double), 12) as decimal(20,12)))"
            )
        ).alias("dim0", "x")
    ).select(F.expr("dim0 + 1").alias("dim"), "x")
    return (
        vals.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.expr("cast(x * x as decimal(30,18))")).alias("sxx"),
        )
        .select(
            "dim",
            "n",
            F.expr("round(cast(sx as double) / n, 6)").alias("mean"),
            F.expr(
                "round(cast(sxx as double) / n"
                " - (cast(sx as double) / n) * (cast(sx as double) / n), 6)"
            ).alias("variance"),
        )
        .orderBy("dim")
    )


EMBED_DIM_STATS_SQL = """
WITH vals AS (
  SELECT i AS dim,
         cast(round(cast(embedding[i] AS double), 12) AS decimal(20,12)) AS x
  FROM embeddings,
       (SELECT unnest(range(1, (SELECT max(len(embedding)) + 1 FROM embeddings))) AS i)
  WHERE i <= len(embedding)
),
agg AS (
  SELECT dim, count(*) AS n, sum(x) AS sx,
         sum(cast(x * x AS decimal(30,18))) AS sxx
  FROM vals GROUP BY 1
)
SELECT cast(dim AS int) AS dim, n,
       round(cast(sx AS double) / n, 6) AS mean,
       round(cast(sxx AS double) / n
             - (cast(sx AS double) / n) * (cast(sx AS double) / n), 6)
         AS variance
FROM agg ORDER BY dim
"""


def token_len_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token_len, n_tokens, n_distinct): occurrence and vocabulary
    counts per token length."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    toks = docs.select(F.explode(F.expr(spark_tokens("text"))).alias("term"))
    return (
        toks.groupBy(F.expr("length(term)").alias("token_len"))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("term").alias("n_distinct"),
        )
        .orderBy("token_len")
    )


TOKEN_LEN_HIST_SQL = f"""
SELECT length(term) AS token_len, count(*) AS n_tokens,
       count(DISTINCT term) AS n_distinct
FROM (SELECT unnest({duck_tokens("text")}) AS term FROM documents)
GROUP BY 1 ORDER BY 1
"""


DIAGNOSTICS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embed_dim_stats": embed_dim_stats,
    "token_len_hist": token_len_hist,
}

DIAGNOSTICS_ORACLES: dict[str, str] = {
    "embed_dim_stats": EMBED_DIM_STATS_SQL,
    "token_len_hist": TOKEN_LEN_HIST_SQL,
}
