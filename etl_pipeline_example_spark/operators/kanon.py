"""k-anonymity audit over quasi-identifier combinations.

The privacy-side complement to the PII scrubbers (pii_scrub redacts
direct identifiers; re-identification risk lives in QUASI-identifiers
— attribute combinations unique enough to single a person out). The
standard audit: group by the quasi-identifier tuple, then ask how
many equivalence classes (and how many ROWS) fall below each
k-anonymity threshold — a release is "k-anonymous" when no class is
smaller than k.

Quasi-identifier tuple over the customer table: (c_nationkey,
c_mktsegment, account-balance band ``floor(c_acctbal / 1000)`` —
floor, never a bare CAST: Spark truncates where DuckDB rounds, the
known cross-engine trap). Thresholds k ∈ {2, 5, 10, 20}. Output per
k: the number of violating classes, the rows exposed in them, and
the totals — all exact integers.

Scale shape: one map-side-combined aggregate to class sizes (the
class-size frame is at most |quasi-id domain| rows), then a
broadcast join against the 4-row threshold table and a G-sized
re-aggregate; no window, no global sort.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline/privacy surface,
SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

KANON_KS = (2, 5, 10, 20)


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, n_classes_below, n_rows_exposed, n_classes, n_rows):
    k-anonymity census of the customer quasi-identifier tuple."""
    classes = (
        read_table(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias("band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    ks = spark.createDataFrame([(k,) for k in KANON_KS], "k int")
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_classes_below"),
            F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_exposed"),
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("sz").cast("bigint").alias("n_rows"),
        )
        .orderBy("k")
    )


_KS_SQL = ", ".join(f"({k})" for k in KANON_KS)

PRIVACY_K_ANONYMITY_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
         count(*) AS sz
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT t.k,
       CAST(sum(CASE WHEN c.sz < t.k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_below,
       CAST(sum(CASE WHEN c.sz < t.k THEN c.sz ELSE 0 END) AS BIGINT)
         AS n_rows_exposed,
       count(*) AS n_classes,
       CAST(sum(c.sz) AS BIGINT) AS n_rows
FROM classes c CROSS JOIN (VALUES {_KS_SQL}) t(k)
GROUP BY 1
ORDER BY 1
"""


LDIV_LS = (2, 3, 5)


def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l, n_classes_below, n_rows_exposed, n_classes, n_rows):
    l-diversity census — quasi-identifier classes (nation, balance
    band) whose SENSITIVE attribute (market segment) takes fewer than
    l distinct values; k-anonymous classes with a homogeneous
    sensitive value still leak it, which is exactly what this audit
    catches beyond privacy_k_anonymity."""
    classes = (
        read_table(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias("band"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "band")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.countDistinct("c_mktsegment").alias("div"),
        )
    )
    ls = spark.createDataFrame([(l,) for l in LDIV_LS], "l int")
    return (
        classes.crossJoin(F.broadcast(ls))
        .groupBy("l")
        .agg(
            F.sum(F.when(F.col("div") < F.col("l"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_classes_below"),
            F.sum(
                F.when(F.col("div") < F.col("l"), F.col("sz")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rows_exposed"),
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("sz").cast("bigint").alias("n_rows"),
        )
        .orderBy("l")
    )


_LS_SQL = ", ".join(f"({l})" for l in LDIV_LS)

PRIVACY_L_DIVERSITY_SQL = f"""
WITH classes AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
         count(*) AS sz,
         count(DISTINCT c_mktsegment) AS div
  FROM customer
  GROUP BY 1, 2
)
SELECT t.l,
       CAST(sum(CASE WHEN c.div < t.l THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_below,
       CAST(sum(CASE WHEN c.div < t.l THEN c.sz ELSE 0 END) AS BIGINT)
         AS n_rows_exposed,
       count(*) AS n_classes,
       CAST(sum(c.sz) AS BIGINT) AS n_rows
FROM classes c CROSS JOIN (VALUES {_LS_SQL}) t(l)
GROUP BY 1
ORDER BY 1
"""


KANON_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "privacy_k_anonymity": privacy_k_anonymity,
    "privacy_l_diversity": privacy_l_diversity,
}

KANON_ORACLES: dict[str, str] = {
    "privacy_k_anonymity": PRIVACY_K_ANONYMITY_SQL,
    "privacy_l_diversity": PRIVACY_L_DIVERSITY_SQL,
}
