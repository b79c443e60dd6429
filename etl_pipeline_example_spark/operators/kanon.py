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


# t-closeness thresholds as exact fractions (tnum/tden): a class
# violates t iff TVD > t, i.e. num * tden > tnum * den — integer-only
TCLOSE_TS = ((1, 5), (7, 20), (1, 2))


def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t, n_classes_above, n_rows_exposed, n_classes, n_rows):
    t-closeness census (Li/Li/Venkatasubramanian '07) — classes whose
    SENSITIVE-attribute distribution sits farther than t from the
    global one in total variation distance. Completes the privacy
    trio: k-anonymity bounds class SIZE, l-diversity bounds distinct
    sensitive VALUES, t-closeness bounds the whole DISTRIBUTION (a
    diverse class can still skew revealingly). TVD is the house
    distance (chi2/TVD, never KL — no log): exact integers with
    num = n_c·N + Σ_present(|c_s·N − g_s·n_c| − g_s·n_c) and
    den = 2·n_c·N — the n_c·N term folds in every segment ABSENT
    from the class (|0 − g_s·n_c| summed over absent s, using
    Σ_all g_s = N), so only present (class, segment) rows are ever
    scanned; thresholds compare as cross-multiplied fractions, no
    float division anywhere before the label column."""
    cus = read_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias("band"),
        "c_mktsegment",
    )
    seg = cus.groupBy("c_nationkey", "band", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cs")
    )
    sizes = seg.groupBy("c_nationkey", "band").agg(
        F.sum("cs").cast("bigint").alias("nc")
    )
    gl = F.broadcast(
        cus.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("gs"))
    )
    tot = F.broadcast(cus.agg(F.count(F.lit(1)).alias("nn")))
    per_class = (
        seg.join(sizes, ["c_nationkey", "band"])
        .join(gl, "c_mktsegment")
        .crossJoin(tot)
        .groupBy("c_nationkey", "band")
        .agg(
            F.max("nc").alias("nc"),
            F.max("nn").alias("nn"),
            F.sum(
                F.abs(F.col("cs") * F.col("nn") - F.col("gs") * F.col("nc"))
                - F.col("gs") * F.col("nc")
            )
            .cast("bigint")
            .alias("adj"),
        )
        .select(
            "nc",
            (F.col("nc") * F.col("nn") + F.col("adj")).alias("num"),
            (F.lit(2) * F.col("nc") * F.col("nn")).alias("den"),
        )
    )
    ts = spark.createDataFrame(
        [(tn / td, tn, td) for tn, td in TCLOSE_TS],
        "t double, tnum int, tden int",
    )
    return (
        per_class.crossJoin(F.broadcast(ts))
        .groupBy("t")
        .agg(
            F.sum(
                F.when(
                    F.col("num") * F.col("tden")
                    > F.col("tnum") * F.col("den"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_classes_above"),
            F.sum(
                F.when(
                    F.col("num") * F.col("tden")
                    > F.col("tnum") * F.col("den"),
                    F.col("nc"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rows_exposed"),
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("nc").cast("bigint").alias("n_rows"),
        )
        .orderBy("t")
    )


_TS_SQL = ", ".join(
    f"(CAST({tn} AS DOUBLE) / {td}, {tn}, {td})" for tn, td in TCLOSE_TS
)

PRIVACY_T_CLOSENESS_SQL = f"""
WITH cus AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
         c_mktsegment
  FROM customer
),
seg AS (
  SELECT c_nationkey, band, c_mktsegment, count(*) AS cs
  FROM cus GROUP BY 1, 2, 3
),
sizes AS (
  SELECT c_nationkey, band, CAST(sum(cs) AS BIGINT) AS nc
  FROM seg GROUP BY 1, 2
),
gl AS (SELECT c_mktsegment, count(*) AS gs FROM cus GROUP BY 1),
tot AS (SELECT count(*) AS nn FROM cus),
per_class AS (
  SELECT z.nc,
         z.nc * z.nn + z.adj AS num,
         2 * z.nc * z.nn AS den
  FROM (
    SELECT s2.nc, max(t.nn) AS nn,
           CAST(sum(abs(s.cs * t.nn - g.gs * s2.nc)
                    - g.gs * s2.nc) AS BIGINT) AS adj
    FROM seg s
    JOIN sizes s2 USING (c_nationkey, band)
    JOIN gl g USING (c_mktsegment)
    CROSS JOIN tot t
    GROUP BY s.c_nationkey, s.band, s2.nc
  ) z
)
SELECT v.t,
       CAST(sum(CASE WHEN p.num * v.tden > v.tnum * p.den
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_classes_above,
       CAST(sum(CASE WHEN p.num * v.tden > v.tnum * p.den
                     THEN p.nc ELSE 0 END) AS BIGINT) AS n_rows_exposed,
       count(*) AS n_classes,
       CAST(sum(p.nc) AS BIGINT) AS n_rows
FROM per_class p CROSS JOIN (VALUES {_TS_SQL}) v(t, tnum, tden)
GROUP BY 1
ORDER BY 1
"""


KANON_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "privacy_k_anonymity": privacy_k_anonymity,
    "privacy_l_diversity": privacy_l_diversity,
    "privacy_t_closeness": privacy_t_closeness,
}

KANON_ORACLES: dict[str, str] = {
    "privacy_k_anonymity": PRIVACY_K_ANONYMITY_SQL,
    "privacy_l_diversity": PRIVACY_L_DIVERSITY_SQL,
    "privacy_t_closeness": PRIVACY_T_CLOSENESS_SQL,
}
