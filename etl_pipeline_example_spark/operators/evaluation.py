"""Clustering evaluation and dataset split assignment.

  cluster_purity  the ground-truth check the embeddings table's label
                  column exists for: per k-means cell, the majority
                  label and its share — the standard external
                  clustering metric (purity), telling you whether the
                  quantizer's cells track the semantic classes.
                  Composes oracle-exact kmeans_assign; ties on the
                  majority break toward the smaller label id.
  sample_split    deterministic train/val/test assignment (the
                  foundational ML-data split): a 60-bit content hash
                  of the doc id thresholded at 98 / 1 / 1 percent —
                  stable across runs and partitionings, no RNG state,
                  reproducible from the row alone (the sample_hash
                  discipline, three-way and labeled).

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 rows 27o and 35k.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_hexint, spark_hexint
from etl_pipeline_example_spark.operators.kmeans import KMEANS_ASSIGN_SQL, kmeans_assign
from etl_pipeline_example_spark.operators.simcore import tracked_persist
from etl_pipeline_example_spark.sources.readers import read_table

SPLIT_MOD = 100  # hash buckets: 0-97 train, 98 val, 99 test


def cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_id, n, majority_label, purity): external clustering
    quality against the embeddings' label column.

    Scale shape: the assignment is kmeans_assign's broadcast pass; the
    (cluster, label) contingency aggregate is K × labels bounded after
    the map-side combine, and the majority pick is a rank over that
    bounded table.
    """
    assign = kmeans_assign(spark, sf_dir).select("vec_id", "cluster_id")
    emb = read_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "label"
    )
    # persisted: the K×labels contingency table feeds BOTH the totals
    # aggregate and the majority window — unpersisted, the kmeans
    # assignment join ran twice inside the one result job.
    cont = tracked_persist(
        assign.join(emb, "vec_id")
        .groupBy("cluster_id", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    totals = cont.groupBy("cluster_id").agg(F.sum("cnt").alias("n"))
    major = (
        cont.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("cluster_id", F.col("label").alias("majority_label"), F.col("cnt").alias("m"))
    )
    return (
        totals.join(major, "cluster_id")
        .select(
            "cluster_id",
            "n",
            "majority_label",
            F.expr("round(cast(m as double) / cast(n as double), 6)").alias("purity"),
        )
        .orderBy("cluster_id")
    )


CLUSTER_PURITY_SQL = f"""
WITH assign AS ({KMEANS_ASSIGN_SQL}),
cont AS (
  SELECT a.cluster_id, e.label, count(*) AS cnt
  FROM assign a JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
),
totals AS (SELECT cluster_id, cast(sum(cnt) AS bigint) AS n FROM cont GROUP BY 1),
major AS (
  SELECT cluster_id, label AS majority_label, cnt AS m FROM (
    SELECT cluster_id, label, cnt,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY cnt DESC, label) AS rk
    FROM cont
  ) WHERE rk = 1
)
SELECT t.cluster_id, t.n, j.majority_label,
       round(cast(j.m AS double) / cast(t.n AS double), 6) AS purity
FROM totals t JOIN major j USING (cluster_id)
ORDER BY cluster_id
"""


def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bucket, split): 98/1/1 train/val/test by content-derived
    hash — membership reproducible from the row alone."""
    h = spark_hexint("concat('split:', cast(doc_id as string))")
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    return docs.select(
        "doc_id",
        F.expr(f"pmod({h}, {SPLIT_MOD})").alias("bucket"),
    ).select(
        "doc_id",
        "bucket",
        F.expr(
            f"CASE WHEN bucket < {SPLIT_MOD - 2} THEN 'train'"
            f" WHEN bucket = {SPLIT_MOD - 2} THEN 'val'"
            " ELSE 'test' END"
        ).alias("split"),
    )


SAMPLE_SPLIT_SQL = f"""
SELECT doc_id, bucket,
       CASE WHEN bucket < {SPLIT_MOD - 2} THEN 'train'
            WHEN bucket = {SPLIT_MOD - 2} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         {duck_hexint("concat('split:', cast(doc_id as varchar))")} % {SPLIT_MOD}
           AS bucket
  FROM documents
)
"""


EVALUATION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cluster_purity": cluster_purity,
    "sample_split": sample_split,
}

EVALUATION_ORACLES: dict[str, str] = {
    "cluster_purity": CLUSTER_PURITY_SQL,
    "sample_split": SAMPLE_SPLIT_SQL,
}
