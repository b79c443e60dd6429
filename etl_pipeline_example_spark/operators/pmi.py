"""Corpus collocation mining: top-K token bigrams by PMI-equivalent lift.

Church & Hanks 1990 rank word pairs by pointwise mutual information
PMI = log p(a,b) / (p(a,·) p(·,b)) over the bigram sample space; the
collocation list is a standard corpus-analysis product (phrase
detection for tokenizers, stopword-phrase discovery, quality probes).
Log ulps differ between engines, so the score here is the LIFT
p(a,b) / (p(a,·) p(·,b)) = c_ab·N / (l_a·r_b) — log's argument, a
strictly monotone transform, so the ranking is IDENTICAL to PMI's —
computed as one IEEE division of two exact decimal(38,0)→double casts:
bit-identical across engines with no rounding step at all. The decimal
cast before the multiply is the 100 TB overflow discipline: c_ab·N can
reach ~N² ≈ 10^28 at corpus scale, past bigint but inside decimal(38).

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 36a.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens
from etl_pipeline_example_spark.sources.readers import read_table

PMI_MIN_COUNT = 5  # prune the hapax tail BEFORE any join — the scale lever
PMI_TOP = 50


def pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``PMI_TOP`` bigrams by lift: (w1, w2, pair_cnt, lift).

    Scale shape: one explode pass feeds a single (w1, w2) groupBy whose
    shuffle is map-side-combined (carries distinct pairs, not token
    occurrences). The marginals l_a (token-as-left) and r_b
    (token-as-right) REUSE the aggregated pair table — summing
    pair_cnt by w1 / by w2 — so the corpus is scanned exactly once.
    The ``PMI_MIN_COUNT`` filter prunes the hapax tail before the two
    vocab-sized marginal joins, the one-row total broadcasts, and the
    final top-K is TakeOrderedAndProject (no global sort).
    """
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    pairs = (
        docs.select(F.expr(spark_tokens("text")).alias("tk"))
        .filter(F.expr("size(tk) >= 2"))
        .select(F.explode(F.expr("sequence(0, size(tk) - 2)")).alias("j"), "tk")
        .select(
            F.expr("tk[j]").alias("w1"),
            F.expr("tk[j + 1]").alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    left = pairs.groupBy("w1").agg(F.sum("pair_cnt").alias("l_cnt"))
    right = pairs.groupBy("w2").agg(F.sum("pair_cnt").alias("r_cnt"))
    total = pairs.agg(F.sum("pair_cnt").alias("n_total"))
    lift = (
        "cast(cast(pair_cnt as decimal(19,0)) * cast(n_total as decimal(19,0))"
        " as double)"
        " / cast(cast(l_cnt as decimal(19,0)) * cast(r_cnt as decimal(19,0))"
        " as double)"
    )
    return (
        pairs.filter(F.col("pair_cnt") >= PMI_MIN_COUNT)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "pair_cnt", F.expr(lift).alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(PMI_TOP)
    )


PMI_SQL = f"""
WITH tk_tbl AS (
  SELECT {duck_tokens("text")} AS tk FROM documents
),
pairs AS (
  SELECT tk[j + 1] AS w1, tk[j + 2] AS w2, count(*) AS pair_cnt
  FROM tk_tbl,
       (SELECT unnest(range(0, (SELECT coalesce(max(len(tk)), 0) FROM tk_tbl))) AS j)
  WHERE len(tk) >= 2 AND j <= len(tk) - 2
  GROUP BY 1, 2
),
lefts AS (SELECT w1, cast(sum(pair_cnt) AS bigint) AS l_cnt FROM pairs GROUP BY 1),
rights AS (SELECT w2, cast(sum(pair_cnt) AS bigint) AS r_cnt FROM pairs GROUP BY 1),
total AS (SELECT cast(sum(pair_cnt) AS bigint) AS n_total FROM pairs)
SELECT p.w1, p.w2, p.pair_cnt,
       cast(cast(p.pair_cnt AS decimal(19,0)) * cast(t.n_total AS decimal(19,0))
            AS double)
       / cast(cast(l.l_cnt AS decimal(19,0)) * cast(r.r_cnt AS decimal(19,0))
            AS double) AS lift
FROM pairs p
JOIN lefts l USING (w1)
JOIN rights r USING (w2)
CROSS JOIN total t
WHERE p.pair_cnt >= {PMI_MIN_COUNT}
ORDER BY lift DESC, p.w1, p.w2
LIMIT {PMI_TOP}
"""


PMI_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pmi_bigrams": pmi_bigrams,
}

PMI_ORACLES: dict[str, str] = {
    "pmi_bigrams": PMI_SQL,
}
