"""Cross-source content-overlap matrix (contamination surface).

A training-data pipeline mixing N sources needs to know how much
content the sources share BEFORE mixing: heavy overlap between two
sources inflates effective duplication (``dedup_savings`` measures the
global rate; this panel localizes it to source pairs) and breaks the
independence assumption behind mixture weights (``mix_weights``).

Two overlap signals per source pair, both exact and integer-valued:

- ``n_shared_shingles``  — distinct ``SHINGLE_K``-token shingles
  occurring in BOTH sources (the ``ngram_jaccard`` / ``dedup_minhash``
  shingle space, imported from dedup.py — one construction site).
- ``n_shared_contents``  — distinct exact content hashes (the
  ``dedup_exact`` md5-of-normalized-text spine) present in both.

Output is the full pair universe (every unordered source pair, from a
bounded source-dimension cross join — the ``q_gapfill`` precedent), so
zero-overlap pairs are explicit rows and the row count is stable
(|S|·(|S|-1)/2) at every scale factor.

Scale shape: both spines aggregate per KEY (shingle / content hash)
into a sorted source SET first — bounded by the source-label
cardinality, not the corpus — and expand pairs from the set (never a
key-keyed self-join row blowup). The pair-count shuffle then carries
≤ |S|² rows. Source labels here are channel-grade (tens to thousands);
for web-scale domain keys use the ``domain_cap`` / ``domain_chi2``
family instead.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dedup import (
    _DUCK_SHINGLES_CTE,
    _spark_shingle_table,
)
from etl_pipeline_example_spark.operators.hashing import (
    duck_norm_text,
    spark_norm_text,
)
from etl_pipeline_example_spark.sources.readers import read_table


def _pair_counts(keyed: DataFrame, out: str) -> DataFrame:
    """(source_a, source_b, ``out``): for a distinct (k, source) frame,
    the number of keys whose source set contains both — via per-key
    sorted source sets expanded to in-set pairs (set size is bounded by
    the source cardinality, so the expansion is O(|S|²) per key worst
    case and tiny in practice)."""
    return (
        keyed.groupBy("k")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (x, i) ->"
                    " transform(slice(srcs, i + 2, size(srcs)),"
                    " y -> named_struct('source_a', x, 'source_b', y))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.source_a").alias("source_a"), F.col("p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias(out))
    )


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, n_shared_shingles, n_shared_contents) for
    every unordered source pair (source_a < source_b)."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    sh_src = (
        _spark_shingle_table(spark, sf_dir)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(F.col("shingle").alias("k"), "source")
        .distinct()
    )
    hs = docs.select(
        F.expr(f"md5({spark_norm_text('text')})").alias("k"), "source"
    ).distinct()
    srcs = docs.select("source").distinct()
    univ = (
        srcs.alias("a")
        .crossJoin(srcs.alias("b"))
        .filter(F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
    )
    return (
        univ.join(_pair_counts(sh_src, "nss"), ["source_a", "source_b"], "left")
        .join(_pair_counts(hs, "nsc"), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.expr("cast(coalesce(nss, 0) as bigint)").alias("n_shared_shingles"),
            F.expr("cast(coalesce(nsc, 0) as bigint)").alias("n_shared_contents"),
        )
        .orderBy("source_a", "source_b")
    )


SOURCE_OVERLAP_MATRIX_SQL = f"""
WITH {_DUCK_SHINGLES_CTE.strip()},
sh_src AS (
  SELECT DISTINCT d.source, s.shingle
  FROM shingle_tbl s JOIN documents d USING (doc_id)
),
sh_pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS nss
  FROM sh_src a JOIN sh_src b
    ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
),
hs AS (
  SELECT DISTINCT md5({duck_norm_text("text")}) AS h, source FROM documents
),
h_pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS nsc
  FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
),
univ AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM (SELECT DISTINCT source FROM documents) a
  JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source
)
SELECT u.source_a, u.source_b,
       cast(coalesce(sp.nss, 0) as bigint) AS n_shared_shingles,
       cast(coalesce(hp.nsc, 0) as bigint) AS n_shared_contents
FROM univ u
LEFT JOIN sh_pairs sp ON sp.source_a = u.source_a AND sp.source_b = u.source_b
LEFT JOIN h_pairs hp ON hp.source_a = u.source_a AND hp.source_b = u.source_b
ORDER BY u.source_a, u.source_b
"""


SOURCEOVERLAP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "source_overlap_matrix": source_overlap_matrix,
}

SOURCEOVERLAP_ORACLES: dict[str, str] = {
    "source_overlap_matrix": SOURCE_OVERLAP_MATRIX_SQL,
}
