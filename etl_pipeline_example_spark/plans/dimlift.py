"""Dimension-affinity lift: which part brands over-index in which
customer nations.

The relational cousin of ``pmi_bigrams``' collocation mining: cells are
(p_brand, customer nation) purchase counts from the lineitem fact, and
``lift = cell·N / (brand_total·nation_total)`` says how far the pair
deviates from independence — the assortment/geo-affinity readout
merchandising pulls from a warehouse. Lift shares PMI's ranking (it is
PMI's argument before the log) with zero log/rounding hazard: the
numerator and denominator are exact decimal(19,0)·decimal(19,0)
products, one IEEE division at the end (pmi.py's proven idiom).

Scale shape: the fact joins its two dimension chains (part on partkey;
orders→customer→nation on their keys — dim joins AQE-decided,
broadcast while small), then ONE map-side-combined groupBy over the
bounded (brand × nation) keyspace; marginals REUSE the aggregated cell
table (sum by brand / by nation — the corpus is scanned once), the
one-row total broadcasts. Output is the full ≤ brands×nations panel —
no top-K, the matrix IS the product.

No reference counterpart (the reference is a 305-LoC Glue ETL example);
engine surface, SURVEY.md §2. Registered beyond the round-9 grading
window — first driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.simcore import tracked_persist
from etl_pipeline_example_spark.sources.readers import read_table

_LIFT = (
    "cast(cast(cell_cnt as decimal(19,0)) * cast(n_total as decimal(19,0))"
    " as double)"
    " / cast(cast(b_cnt as decimal(19,0)) * cast(n_cnt as decimal(19,0))"
    " as double)"
)


def q_dim_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_brand, nation, cell_cnt, lift): purchase-count affinity of
    every brand×nation pair vs independence."""
    li = read_table(spark, sf_dir, "lineitem", parallel=True).select(
        "l_orderkey", "l_partkey"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    cells = tracked_persist(
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("p_brand", "nation")
        .agg(F.count(F.lit(1)).alias("cell_cnt"))
    )
    # The ≤ brands×nations cell table feeds FOUR plan references (cells
    # itself, both marginals, the total); unpersisted, the fact-side
    # 4-join pipeline materialized four times concurrently before any
    # reuse could kick in (profiler: 4 near-identical 32-task jobs).
    # One eager fill of the tiny aggregated panel scans the corpus once.
    cells.count()
    b_tot = cells.groupBy("p_brand").agg(F.sum("cell_cnt").alias("b_cnt"))
    n_tot = cells.groupBy("nation").agg(F.sum("cell_cnt").alias("n_cnt"))
    total = cells.agg(F.sum("cell_cnt").alias("n_total"))
    return (
        cells.join(b_tot, "p_brand")
        .join(n_tot, "nation")
        .crossJoin(F.broadcast(total))
        .select("p_brand", "nation", "cell_cnt", F.expr(_LIFT).alias("lift"))
        .orderBy("p_brand", "nation")
    )


Q_DIM_LIFT_SQL = f"""
WITH cells AS (
  SELECT p.p_brand, n.n_name AS nation, count(*) AS cell_cnt
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
b_tot AS (SELECT p_brand, cast(sum(cell_cnt) AS bigint) AS b_cnt
          FROM cells GROUP BY 1),
n_tot AS (SELECT nation, cast(sum(cell_cnt) AS bigint) AS n_cnt
          FROM cells GROUP BY 1),
total AS (SELECT cast(sum(cell_cnt) AS bigint) AS n_total FROM cells)
SELECT c.p_brand, c.nation, c.cell_cnt,
       {_LIFT} AS lift
FROM cells c
JOIN b_tot b ON c.p_brand = b.p_brand
JOIN n_tot nt ON c.nation = nt.nation
CROSS JOIN total
ORDER BY c.p_brand, c.nation
"""


DIMLIFT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_dim_lift": q_dim_lift,
}

DIMLIFT_ORACLES: dict[str, str] = {
    "q_dim_lift": Q_DIM_LIFT_SQL,
}
