"""Corpus novelty and embedding-space outlier triage.

  ngram_novelty   per-doc novelty: the fraction of a document's
                  distinct word-5-grams that occur NOWHERE else in the
                  corpus. Zero novelty = fully templated/boilerplate
                  text; near-1 = wholly fresh content. The
                  self-referential cousin of contamination_ngram
                  (there: overlap with an eval set; here: overlap with
                  everything else), sharing its explode/df machinery.
  embed_outliers  semantic outliers: documents whose embedding sits
                  beyond the 95th-percentile centroid distance of
                  their own k-means cell — the triage list SemDedup-
                  style pipelines inspect for junk/misembedded
                  content. Composes the oracle-exact kmeans_assign;
                  the oracle wraps its full SQL as a CTE.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 rows 35j and 27m.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.decontam import NGRAM_N
from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    duck_tokens,
    spark_hexint,
    spark_tokens,
)
from etl_pipeline_example_spark.operators.kmeans import KMEANS_ASSIGN_SQL, kmeans_assign
from etl_pipeline_example_spark.operators.simcore import tracked_persist
from etl_pipeline_example_spark.sources.readers import read_table

OUTLIER_PCTL = 0.95


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams, n_unique, novelty): distinct 5-grams, how many
    are corpus-unique, and their ratio (6-dp exact division).

    Scale shape: one explode → distinct (doc, gram-hash) pass; the df
    aggregate is gram-keyed and map-side combined; the unique set
    (df = 1) semi-joins back. Join keys are 60-bit hashes throughout —
    no text rides a shuffle.
    """
    gram = spark_hexint(f"concat_ws(' ', slice(tk, j + 1, {NGRAM_N}))")
    grams = (
        read_table(spark, sf_dir, "documents", parallel=True)
        .select("doc_id", F.expr(spark_tokens("text")).alias("tk"))
        .filter(F.expr(f"size(tk) >= {NGRAM_N}"))
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(0, size(tk) - {NGRAM_N})")).alias("j"),
            "tk",
        )
        .select("doc_id", F.expr(gram).alias("g"))
        .distinct()
    )
    unique = (
        grams.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter("df = 1")
    )
    per_doc = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    uniq_per_doc = (
        grams.join(unique.select("g"), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return (
        per_doc.join(uniq_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.expr("coalesce(n_unique, 0L)").alias("n_unique"),
            F.expr(
                "round(cast(coalesce(n_unique, 0) as double)"
                " / cast(n_grams as double), 6)"
            ).alias("novelty"),
        )
    )


NGRAM_NOVELTY_SQL = f"""
WITH tk_tbl AS (
  SELECT doc_id, {duck_tokens("text")} AS tk FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         {duck_hexint(f"array_to_string(tk[j + 1 : j + {NGRAM_N}], ' ')")} AS g
  FROM tk_tbl,
       (SELECT unnest(range(0, (SELECT coalesce(max(len(tk)), 0) FROM tk_tbl))) AS j)
  WHERE len(tk) >= {NGRAM_N} AND j <= len(tk) - {NGRAM_N}
),
uniq AS (SELECT g FROM grams GROUP BY 1 HAVING count(*) = 1),
per_doc AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1),
uniq_per_doc AS (
  SELECT doc_id, count(*) AS n_unique
  FROM grams WHERE g IN (SELECT g FROM uniq) GROUP BY 1
)
SELECT p.doc_id, p.n_grams,
       cast(coalesce(u.n_unique, 0) AS bigint) AS n_unique,
       round(cast(coalesce(u.n_unique, 0) AS double)
             / cast(p.n_grams AS double), 6) AS novelty
FROM per_doc p LEFT JOIN uniq_per_doc u USING (doc_id)
"""


def embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster_id, dist, p95): members sitting beyond their own
    cell's ``OUTLIER_PCTL`` centroid-distance percentile.

    Scale shape: the assignment is kmeans_assign's broadcast pass; the
    per-cell percentile is a K-row aggregate (exact here — at real
    scale swap in approx_percentile, the dq_profile_approx pattern)
    broadcast-joined back; the flag is a scan filter.
    """
    # persisted + eagerly filled: both the percentile aggregate and the
    # flag join reference `assign`, and unpersisted each reference
    # re-ran the ENTIRE two-iteration Lloyd pipeline (profiler: the
    # assignment-pass and means jobs appeared twice). The cached frame
    # is three narrow scalars per vector; the recompute is two corpus
    # broadcast passes plus an explode-aggregate.
    assign = tracked_persist(kmeans_assign(spark, sf_dir))
    assign.count()
    cuts = assign.groupBy("cluster_id").agg(
        F.expr(f"round(percentile(dist, {OUTLIER_PCTL}), 6)").alias("p95")
    )
    return (
        assign.join(F.broadcast(cuts), "cluster_id")
        .filter(F.col("dist") > F.col("p95"))
        .select("vec_id", "cluster_id", "dist", "p95")
    )


EMBED_OUTLIERS_SQL = f"""
WITH assign AS ({KMEANS_ASSIGN_SQL}),
cuts AS (
  SELECT cluster_id,
         round(percentile_cont({OUTLIER_PCTL}) WITHIN GROUP (ORDER BY dist), 6)
           AS p95
  FROM assign GROUP BY 1
)
SELECT a.vec_id, a.cluster_id, a.dist, c.p95
FROM assign a JOIN cuts c USING (cluster_id)
WHERE a.dist > c.p95
"""


NOVELTY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ngram_novelty": ngram_novelty,
    "embed_outliers": embed_outliers,
}

NOVELTY_ORACLES: dict[str, str] = {
    "ngram_novelty": NGRAM_NOVELTY_SQL,
    "embed_outliers": EMBED_OUTLIERS_SQL,
}
