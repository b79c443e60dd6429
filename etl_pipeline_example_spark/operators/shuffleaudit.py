"""Epoch-shuffle quality audit for training-data sharding.

A training epoch at 100 TB is not "sort randomly" — it is "assign
each document to one of S shards by hash, order within each shard by
hash": the shard is the unit one data-loader reads sequentially, so
WITHIN-shard source mixing is what decides whether a consumer sees
correlated runs of same-source documents (bad for SGD) or a
well-interleaved stream. This operator audits exactly that, with
exact integer statistics the DuckDB oracle reproduces bit-for-bit:

per shard (S = 64, shard = pmod(h, S), h = the shared 60-bit md5
construct keyed ``shuf:<doc_id>``):

- ``n_docs``, ``n_sources`` — shard balance + source coverage;
- ``same_src_adj`` — adjacent same-source pairs in hash order (the
  observed run statistic: lag over a window PARTITIONED BY SHARD,
  never a global order — the within-shard sort is the very operation
  a real shuffle materializes);
- ``exp_num = Σ_s c_s·(c_s−1)`` and ``exp_den = n·(n−1)`` — the
  exact integer numerator/denominator of the expected same-source
  adjacency probability under a uniform random order (report the
  ratio's parts, not a float division mid-pipeline: the house
  no-float-summation rule). A healthy shuffle has
  same_src_adj/(n−1) ≈ exp_num/exp_den; a broken one (e.g. hashing
  a key correlated with source) shows same_src_adj inflated.

Determinism: the "random" order is the Knuth-style hash construct
(hashing.py), so both engines walk identical sequences; adjacency
ties cannot occur (distinct doc_ids hash distinctly within a shard at
these scales; the lag orders by (h, doc_id) regardless, so even a
collision is deterministic).

Scale shape: one shuffle on the shard key; the lag window is
partitioned by shard (S bounded partitions, each the size one
consumer reads anyway); output is S rows.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    spark_hexint,
)
from etl_pipeline_example_spark.sources.readers import read_table

SHUF_SHARDS = 64


def shuffle_run_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, n_docs, n_sources, same_src_adj, exp_num, exp_den):
    within-shard source-mixing audit of the deterministic hash
    shuffle."""
    h = spark_hexint("concat('shuf:', cast(doc_id as string))")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(h).alias("h"),
    ).withColumn("shard", F.expr(f"pmod(h, {SHUF_SHARDS})"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    adj = docs.withColumn("prev_src", F.lag("source").over(w))
    per_shard = adj.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(
            F.when(F.col("prev_src") == F.col("source"), 1).otherwise(0)
        ).cast("bigint").alias("same_src_adj"),
    )
    exp = (
        docs.groupBy("shard", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("shard")
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1))
            .cast("bigint")
            .alias("exp_num"),
        )
    )
    return (
        per_shard.join(exp, "shard")
        .select(
            F.col("shard").cast("int").alias("shard"),
            "n_docs",
            F.col("n_sources").cast("int").alias("n_sources"),
            "same_src_adj",
            "exp_num",
            (F.col("n_docs") * (F.col("n_docs") - 1)).alias("exp_den"),
        )
        .orderBy("shard")
    )


_DH = duck_hexint("concat('shuf:', doc_id)")

SHUFFLE_RUN_AUDIT_SQL = f"""
WITH docs AS (
  SELECT doc_id, source, {_DH} AS h, ({_DH} % {SHUF_SHARDS}) AS shard
  FROM documents
),
adj AS (
  SELECT shard, source,
         lag(source) OVER (PARTITION BY shard ORDER BY h, doc_id)
           AS prev_src
  FROM docs
),
per_shard AS (
  SELECT shard, count(*) AS n_docs,
         count(DISTINCT source) AS n_sources,
         CAST(sum(CASE WHEN prev_src = source THEN 1 ELSE 0 END)
              AS BIGINT) AS same_src_adj
  FROM adj GROUP BY 1
),
exp AS (
  SELECT shard, CAST(sum(c * (c - 1)) AS BIGINT) AS exp_num
  FROM (SELECT shard, source, count(*) AS c FROM docs GROUP BY 1, 2)
  GROUP BY 1
)
SELECT CAST(p.shard AS int) AS shard, p.n_docs,
       CAST(p.n_sources AS int) AS n_sources,
       p.same_src_adj, e.exp_num,
       p.n_docs * (p.n_docs - 1) AS exp_den
FROM per_shard p JOIN exp e ON e.shard = p.shard
ORDER BY shard
"""


SHUFFLEAUDIT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "shuffle_run_audit": shuffle_run_audit,
}

SHUFFLEAUDIT_ORACLES: dict[str, str] = {
    "shuffle_run_audit": SHUFFLE_RUN_AUDIT_SQL,
}
