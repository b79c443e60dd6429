"""Association lift for co-ordered part pairs.

The association-rule companion to ``q_basket_pairs`` (basket.py): raw
pair counts reward popular parts; lift = P(a,b)/(P(a)·P(b)) =
n_ab·N/(n_a·n_b) normalizes by both marginals so genuinely-associated
pairs surface. Pairs below a small absolute support floor are dropped
first — the classic rule-mining guard against lift's rare-pair
instability (a single co-occurrence of two one-off parts scores
lift = N).

All counts are exact integers off the SAME deduped (order, part)
projection: the pair table comes from the bounded basket self-join
(Σ|basket|², baskets schema-bounded small), the marginals from one
map-side-combined groupBy joined back onto the surviving pairs, and
the corpus total N from a one-row broadcast. lift is a single double
division per surviving pair — no float ever aggregates (the HHI
discipline). Top-20 rides the deterministic (lift, part_a, part_b)
TakeOrdered, never a global sort.

Lives in its own module (not basket.py) because basket.py backs two
rotated-out registry entries whose bytes are freeze-pinned until
their next regrade window (tools/freeze.py).

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-13 grading window — first
driver slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

BASKET_LIFT_TOP = 20
BASKET_LIFT_MIN_SUPPORT = 2


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_a, part_b, n_a, n_b, n_ab, lift): top association lift
    for co-ordered part pairs above the support floor."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    n_orders = li.groupBy().agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    marg = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.expr("a.l_partkey < b.l_partkey"))
        .groupBy(
            F.expr("a.l_partkey").alias("part_a"),
            F.expr("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_LIFT_MIN_SUPPORT)
    )
    ma = marg.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    mb = marg.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    return (
        pairs.join(ma, "part_a")
        .join(mb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_a",
            "n_b",
            "n_ab",
            F.expr(
                "cast(n_ab * n_orders as double)"
                " / cast(n_a * n_b as double)"
            ).alias("lift"),
        )
        .orderBy(
            F.col("lift").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(BASKET_LIFT_TOP)
    )


Q_BASKET_LIFT_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (
  SELECT count(DISTINCT l_orderkey) AS n_orders FROM li
),
marg AS (
  SELECT l_partkey, count(*) AS n_part FROM li GROUP BY 1
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {BASKET_LIFT_MIN_SUPPORT}
)
SELECT part_a, part_b,
       ma.n_part AS n_a, mb.n_part AS n_b, n_ab,
       cast(n_ab * n_orders.n_orders AS double)
         / cast(ma.n_part * mb.n_part AS double) AS lift
FROM pairs
JOIN marg ma ON pairs.part_a = ma.l_partkey
JOIN marg mb ON pairs.part_b = mb.l_partkey
CROSS JOIN n_orders
ORDER BY lift DESC, part_a, part_b
LIMIT {BASKET_LIFT_TOP}
"""


BASKETLIFT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_basket_lift": q_basket_lift,
}

BASKETLIFT_ORACLES: dict[str, str] = {
    "q_basket_lift": Q_BASKET_LIFT_SQL,
}
