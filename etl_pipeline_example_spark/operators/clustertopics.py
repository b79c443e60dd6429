"""Semantic-cluster labeling: top terms per k-means cell.

The corpus-exploration step after clustering: k-means over the
embedding space says WHICH documents sit together; joining the cells
back to the documents' text and surfacing each cell's most frequent
terms says WHAT each cluster is about — the summary a pipeline owner
reads before deciding which clusters to keep, cap, or drop (topic-
aware curation, the SemDedup paper's cluster-inspection loop).

Pairing contract: ``embeddings.vec_id`` is the embedding of
``documents.doc_id`` (the tables are generated id-aligned). The
cluster assignment is the ORACLE-EXACT 2-iteration ``kmeans_assign``
(operators/kmeans.py), and this operator's DuckDB oracle WRAPS that
operator's full oracle SQL as a CTE — composition at the SQL level
too, so the whole chain (Lloyd rounds → assignment → text join → term
ranking) is verified end-to-end bit-for-bit.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 27l.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens
from etl_pipeline_example_spark.operators.kmeans import KMEANS_ASSIGN_SQL, kmeans_assign
from etl_pipeline_example_spark.sources.readers import read_table

TOPIC_TOP_TERMS = 5


def cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_id, term, n, rank): each cluster's ``TOPIC_TOP_TERMS``
    most frequent terms across its member documents.

    Scale shape: the assignment is K-bounded state broadcast against
    the corpus (kmeans_assign's contract); the text side is one explode
    whose (cluster, term) aggregate map-side-combines to vocabulary-
    bounded partials; the per-cluster top-K is a rank over
    (cluster, term-count) rows — K × vocab at most, corpus-independent.
    """
    assign = kmeans_assign(spark, sf_dir).select("vec_id", "cluster_id")
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    terms = docs.select(
        "doc_id", F.explode(F.expr(spark_tokens("text"))).alias("term")
    )
    counts = (
        terms.join(assign, terms.doc_id == assign.vec_id)
        .groupBy("cluster_id", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPIC_TOP_TERMS)
        .select("cluster_id", "term", "n", "rank")
    )


CLUSTER_TOPICS_SQL = f"""
WITH assign AS ({KMEANS_ASSIGN_SQL}),
terms AS (
  SELECT doc_id, unnest({duck_tokens("text")}) AS term FROM documents
),
counts AS (
  SELECT a.cluster_id, t.term, count(*) AS n
  FROM terms t JOIN assign a ON t.doc_id = a.vec_id
  GROUP BY 1, 2
)
SELECT cluster_id, term, n, rank FROM (
  SELECT cluster_id, term, n,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n DESC, term) AS rank
  FROM counts
) WHERE rank <= {TOPIC_TOP_TERMS}
"""


CLUSTERTOPICS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cluster_topics": cluster_topics,
}

CLUSTERTOPICS_ORACLES: dict[str, str] = {
    "cluster_topics": CLUSTER_TOPICS_SQL,
}
