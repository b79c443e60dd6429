"""Domain-shift measurement: χ² divergence of each source vs the corpus.

The mix-analysis companion to ``mix_weights`` (which REWEIGHTS domains)
and ``dsir_weights`` (which scores DOCUMENTS): score each DOMAIN by how
far its hashed-bigram distribution sits from the corpus-wide one —
the number a pipeline owner watches when deciding which domains need
capping, upsampling, or a closer look. χ²(s) = Σ_b (p_s(b) − p(b))²
/ p(b) over the shared ``DSIR_BUCKETS`` feature space, Laplace-
smoothed.

χ² instead of KL BY DESIGN: KL needs log() (library-ulp divergent
across engines — the charlm/DSIR discipline), while every χ² step is
exact-reproducible: 12-dp rounds of IEEE divisions of exact integers,
one rounded per-bucket term, an exact decimal sum. Rank order against
KL is preserved in practice (both are f-divergences, locally
quadratic around p).

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 35i.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dsir import DSIR_BUCKETS, _bigram_buckets
from etl_pipeline_example_spark.operators.hashing import duck_hexint, duck_tokens
from etl_pipeline_example_spark.sources.readers import read_table


def domain_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_bigrams, chi2) — χ² divergence of each source's
    hashed-bigram distribution from the corpus-wide distribution,
    descending (most atypical domain first).

    Scale shape: ONE explode pass feeds a (source, bucket) count whose
    shuffle is bounded by sources × ``DSIR_BUCKETS`` after map-side
    combine; corpus-wide bucket counts and totals derive from THAT
    aggregate (no second scan), and the χ² reduction runs over the
    same bounded table. Nothing corpus-sized ever shuffles twice.
    Defined over GLOBALLY-OCCUPIED buckets (identical convention in
    the oracle; with any real corpus all buckets are occupied).
    """
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    per = (
        _bigram_buckets(docs)
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot_s = per.groupBy("source").agg(F.sum("cnt").alias("t_s"))
    glob = per.groupBy("bucket").agg(F.sum("cnt").alias("g_cnt"))
    tot = per.agg(F.sum("cnt").alias("t_all"))
    # dense (source × bucket) grid so zero-count buckets still contribute
    grid = tot_s.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(tot))
    term = (
        f"round(pow(round(cast(coalesce(cnt, 0) + 1 as double)"
        f" / cast(t_s + {DSIR_BUCKETS} as double), 12)"
        f" - round(cast(g_cnt + 1 as double)"
        f" / cast(t_all + {DSIR_BUCKETS} as double), 12), 2)"
        f" / round(cast(g_cnt + 1 as double)"
        f" / cast(t_all + {DSIR_BUCKETS} as double), 12), 12)"
    )
    return (
        grid.join(per, ["source", "bucket"], "left")
        .select("source", "t_s", F.expr(term).alias("term"))
        .groupBy("source", "t_s")
        .agg(
            F.expr(
                "cast(sum(cast(term as decimal(26,12))) as double)"
            ).alias("chi2")
        )
        .select("source", F.col("t_s").alias("n_bigrams"), "chi2")
        .orderBy(F.col("chi2").desc(), F.col("source").asc())
    )


DOMAIN_CHI2_SQL = f"""
WITH tk_tbl AS (
  SELECT doc_id, source, {duck_tokens("text")} AS tk FROM documents
),
grams AS (
  SELECT source,
         {duck_hexint("concat('dsir:', tk[j + 1], ' ', tk[j + 2])")} % {DSIR_BUCKETS} AS bucket
  FROM tk_tbl,
       (SELECT unnest(range(0, (SELECT coalesce(max(len(tk)), 0) FROM tk_tbl))) AS j)
  WHERE len(tk) >= 2 AND j <= len(tk) - 2
),
per AS (SELECT source, bucket, count(*) AS cnt FROM grams GROUP BY 1, 2),
tot_s AS (SELECT source, cast(sum(cnt) AS bigint) AS t_s FROM per GROUP BY 1),
gbl AS (SELECT bucket, cast(sum(cnt) AS bigint) AS g_cnt FROM per GROUP BY 1),
tot AS (SELECT cast(sum(cnt) AS bigint) AS t_all FROM per),
grid AS (SELECT * FROM tot_s, gbl, tot),
terms AS (
  SELECT g.source, g.t_s,
         round(pow(round(cast(coalesce(p.cnt, 0) + 1 AS double)
                       / cast(g.t_s + {DSIR_BUCKETS} AS double), 12)
                 - round(cast(g.g_cnt + 1 AS double)
                       / cast(g.t_all + {DSIR_BUCKETS} AS double), 12), 2)
             / round(cast(g.g_cnt + 1 AS double)
                   / cast(g.t_all + {DSIR_BUCKETS} AS double), 12), 12) AS term
  FROM grid g LEFT JOIN per p USING (source, bucket)
)
SELECT source, t_s AS n_bigrams,
       cast(sum(cast(term AS decimal(26,12))) AS double) AS chi2
FROM terms GROUP BY 1, 2
ORDER BY chi2 DESC, source
"""


DOMAINSHIFT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "domain_chi2": domain_chi2,
}

DOMAINSHIFT_ORACLES: dict[str, str] = {
    "domain_chi2": DOMAIN_CHI2_SQL,
}
