"""Mutual-top pairs: customer↔part pairs that are each other's #1.

The "stable handshake" readout account teams and recommender
diagnostics use: part P is customer C's top part by spend AND C is
P's top customer — the relationships that dominate BOTH sides of the
market, where a supply disruption or churn event hurts twice. One
aggregation + two rank windows + a conjunction; the classic SQL
interview shape ("mutual best friend") as a first-class operator.

Exactness: spend accumulates as decimal(18,2) (exact integer cents,
order-independent) and BOTH rank windows order by the exact decimal —
never by a rounded double — with (spend DESC, key ASC) deterministic
tie-breaks; the double rendering happens once at the output boundary.

Scale: one map-side-combined (custkey, partkey) aggregate over
lineitem⋈orders is the only corpus-scale pass; the two row_number
windows partition by custkey / partkey respectively (never
unpartitioned), and both are WindowGroupLimit-prunable rank-1 filters.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-14 grading window — first driver slot
round 15.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_mutual_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, p_partkey, pair_spend): pairs where the part is the
    customer's top part by spend and the customer is the part's top
    customer, deterministic (spend DESC, key) tie-breaks."""
    # Hash-repartition on the JOIN key: the single-file lineitem scan
    # is ONE partition, so the join probe + (custkey, partkey) partial
    # aggregate ran as a near-serial ~1 s stage at sf0.1 (profiler).
    # The keyed exchange moves the three pruned columns once, skips
    # round-robin's sort-before-repartition, and doubles as the join's
    # required clustering, so the wide join stage adds no new exchange
    # (guide §2.4/§2.5).
    dp = spark.sparkContext.defaultParallelism
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_extendedprice")
        .repartition(dp, "l_orderkey")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cp = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey", "l_partkey")
        .agg(
            F.expr("sum(cast(l_extendedprice as decimal(18,2)))").alias(
                "spend"
            )
        )
    )
    wc = Window.partitionBy("o_custkey").orderBy(
        F.col("spend").desc(), F.col("l_partkey")
    )
    wp = Window.partitionBy("l_partkey").orderBy(
        F.col("spend").desc(), F.col("o_custkey")
    )
    return (
        cp.withColumn("rc", F.row_number().over(wc))
        .withColumn("rp", F.row_number().over(wp))
        .filter("rc = 1 AND rp = 1")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_partkey").alias("p_partkey"),
            F.expr("cast(spend as double)").alias("pair_spend"),
        )
        .orderBy("c_custkey")
    )


Q_MUTUAL_TOP_PAIRS_SQL = """
WITH cp AS (
  SELECT o.o_custkey, l.l_partkey,
         sum(cast(l.l_extendedprice AS decimal(18,2))) AS spend
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT o_custkey, l_partkey, spend,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY spend DESC, l_partkey) AS rc,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY spend DESC, o_custkey) AS rp
  FROM cp
)
SELECT o_custkey AS c_custkey,
       l_partkey AS p_partkey,
       cast(spend AS double) AS pair_spend
FROM ranked
WHERE rc = 1 AND rp = 1
ORDER BY c_custkey
"""


MUTUALTOP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_mutual_top_pairs": q_mutual_top_pairs,
}

MUTUALTOP_ORACLES: dict[str, str] = {
    "q_mutual_top_pairs": Q_MUTUAL_TOP_PAIRS_SQL,
}
