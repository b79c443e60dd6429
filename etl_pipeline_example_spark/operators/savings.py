"""Dedup savings report: what each dedup method buys in tokens.

The "so-what" number a dedup stage reports upward: training cost is
token count, so the report is tokens before → tokens after per method.
Two rows:

  exact     keep the lowest doc_id per content hash (dedup_exact's
            convention);
  minhash   additionally drop every doc appearing as the HIGHER id of
            a verified near-dup pair (the simple survivor rule — the
            transitive-closure version is dedup_cluster's canonical
            representative; this report uses the pairwise rule both
            engines state identically).

Oracle composes the shared content-hash construct and dedup_minhash's
full CTE chain, so the savings arithmetic is verified through the same
pipeline that produced the pairs.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 21b.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dedup import MINHASH_PAIR_CTES, dedup_minhash
from etl_pipeline_example_spark.operators.hashing import (
    duck_norm_text,
    duck_tokens,
    spark_norm_text,
    spark_tokens,
)
from etl_pipeline_example_spark.sources.readers import read_table


def dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(method, tokens_before, tokens_after, savings_rate): token
    budget impact of exact and exact+minhash dedup.

    Scale shape: one scan computes (doc_id, n_tokens, content_hash);
    the exact keep-set is the min-per-hash join, the near-dup drop set
    is the (candidate-bounded) verified pair list's doc_b column, and
    all three token totals come out of ONE multi-column aggregate over
    the flagged spine — one Spark job, one 1-row collect (the three
    sequential scalar collects this replaces re-ran the minhash chain).
    """
    docs = read_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        F.expr(f"size({spark_tokens('text')})").alias("n_tokens"),
        F.expr(f"md5({spark_norm_text('text')})").alias("h"),
    )
    keeper = docs.groupBy("h").agg(F.min("doc_id").alias("keeper_id"))
    near_drops = (
        dedup_minhash(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_near", F.lit(True))
    )
    flagged = (
        docs.join(keeper, "h")
        .withColumn("is_exact", F.expr("doc_id = keeper_id"))
        .join(near_drops, "doc_id", "left")
    )
    r = flagged.agg(
        F.sum("n_tokens").alias("total"),
        F.sum(F.expr("CASE WHEN is_exact THEN n_tokens ELSE 0 END")).alias(
            "after_exact"
        ),
        F.sum(
            F.expr(
                "CASE WHEN is_exact AND is_near IS NULL THEN n_tokens ELSE 0 END"
            )
        ).alias("after_both"),
    ).collect()[0]
    rows = [
        ("1_exact", r["total"], r["after_exact"]),
        ("2_exact_plus_minhash", r["total"], r["after_both"]),
    ]
    out = spark.createDataFrame(
        rows, "method string, tokens_before bigint, tokens_after bigint"
    )
    return out.withColumn(
        "savings_rate",
        F.expr(
            "round(cast(tokens_before - tokens_after as double)"
            " / cast(tokens_before as double), 6)"
        ),
    )


DEDUP_SAVINGS_SQL = f"""
WITH {MINHASH_PAIR_CTES},
docs AS (
  SELECT doc_id, len({duck_tokens("text")}) AS n_tokens,
         md5({duck_norm_text("text")}) AS h
  FROM documents
),
keep_exact AS (
  SELECT d.* FROM docs d
  JOIN (SELECT h, min(doc_id) AS doc_id FROM docs GROUP BY 1) k
    USING (h, doc_id)
),
near_drops AS (SELECT DISTINCT doc_b AS doc_id FROM mh_pairs),
keep_both AS (
  SELECT * FROM keep_exact
  WHERE doc_id NOT IN (SELECT doc_id FROM near_drops)
),
t AS (SELECT cast(sum(n_tokens) AS bigint) AS total FROM docs),
e AS (SELECT cast(sum(n_tokens) AS bigint) AS after_exact FROM keep_exact),
b AS (SELECT cast(sum(n_tokens) AS bigint) AS after_both FROM keep_both)
SELECT '1_exact' AS method, t.total AS tokens_before,
       e.after_exact AS tokens_after,
       round(cast(t.total - e.after_exact AS double)
             / cast(t.total AS double), 6) AS savings_rate
FROM t, e
UNION ALL
SELECT '2_exact_plus_minhash', t.total, b.after_both,
       round(cast(t.total - b.after_both AS double)
             / cast(t.total AS double), 6)
FROM t, b
"""


SAVINGS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_savings": dedup_savings,
}

SAVINGS_ORACLES: dict[str, str] = {
    "dedup_savings": DEDUP_SAVINGS_SQL,
}
