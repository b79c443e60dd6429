"""Vocabulary rank shift: exact Spearman ρ per source vs the corpus.

"Does src7 use words the way the corpus does?" — the
domain-mismatch diagnostic between domain_chi2 (category counts) and
dsir_weights (importance ratios): compare each source's token
FREQUENCY RANKING against the global ranking. Spearman's ρ over a
shared item set is pure integer arithmetic — ρ = 1 − 6Σd²/(n(n²−1))
with d = rank difference — so unlike Pearson-over-frequencies it
needs no float moments at all (the suite's log/float-free drift
discipline; ranking is also what makes it robust to the source-size
marginals that dominate raw counts).

Validity detail: both rankings are computed WITHIN the common
(source ∩ global) token set after the join — Spearman's closed form
assumes two permutations of the SAME items; ranking before the join
would compare ranks over different supports and ρ could leave
[−1, 1]. Ties broken by term, so both rankings are total and the
statistic is deterministic.

Scale: one explode + map-side-combined (source, term) count; the
global marginal re-rolls from it (vocab-bounded, strictly smaller);
rank windows are PARTITIONED BY source over vocab-bounded rows —
never row-scale window state. Output: one row per source.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md
§2. Registered beyond the round-13 grading window — first driver
slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_tokens,
    spark_tokens,
)
from etl_pipeline_example_spark.sources.readers import read_table


def vocab_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_common, sum_d2, rho): exact Spearman rank
    correlation of each source's token-frequency ranking against the
    global ranking, over their common vocabulary."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    src_counts = (
        docs.select(
            "source", F.explode(F.expr(spark_tokens("text"))).alias("term")
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n_src"))
    )
    glob_counts = src_counts.groupBy("term").agg(
        F.sum("n_src").alias("n_glob")
    )
    joined = src_counts.join(glob_counts, "term")
    w_src = Window.partitionBy("source").orderBy(
        F.col("n_src").desc(), F.col("term")
    )
    w_glob = Window.partitionBy("source").orderBy(
        F.col("n_glob").desc(), F.col("term")
    )
    ranked = joined.select(
        "source",
        (F.row_number().over(w_src) - F.row_number().over(w_glob)).alias(
            "d"
        ),
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.expr("cast(d as bigint) * cast(d as bigint)")).alias(
                "sum_d2"
            ),
        )
        .select(
            "source",
            "n_common",
            "sum_d2",
            F.expr(
                "1.0D - 6.0D * cast(sum_d2 as double)"
                " / (cast(n_common as double)"
                " * (cast(n_common as double) * cast(n_common as double)"
                " - 1.0D))"
            ).alias("rho"),
        )
        .orderBy("source")
    )


VOCAB_RANK_SHIFT_SQL = f"""
WITH src_counts AS (
  SELECT source, term, count(*) AS n_src
  FROM (SELECT source, unnest({duck_tokens("text")}) AS term
        FROM documents)
  GROUP BY 1, 2
),
glob_counts AS (
  SELECT term, sum(n_src) AS n_glob FROM src_counts GROUP BY 1
),
ranked AS (
  SELECT s.source,
         row_number() OVER (PARTITION BY s.source
                            ORDER BY s.n_src DESC, s.term)
         - row_number() OVER (PARTITION BY s.source
                              ORDER BY g.n_glob DESC, s.term) AS d
  FROM src_counts s JOIN glob_counts g USING (term)
),
agg AS (
  SELECT source, count(*) AS n_common,
         cast(sum(d * d) AS bigint) AS sum_d2
  FROM ranked GROUP BY 1
)
SELECT source, n_common, sum_d2,
       1.0 - 6.0 * cast(sum_d2 AS double)
         / (cast(n_common AS double)
            * (cast(n_common AS double) * cast(n_common AS double) - 1.0))
         AS rho
FROM agg
ORDER BY source
"""


RANKSHIFT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "vocab_rank_shift": vocab_rank_shift,
}

RANKSHIFT_ORACLES: dict[str, str] = {
    "vocab_rank_shift": VOCAB_RANK_SHIFT_SQL,
}
