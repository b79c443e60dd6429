"""Top movers: the month-over-month revenue delta leaderboard.

The "what changed" panel on every revenue dashboard: per part brand,
this month's discounted revenue minus last OBSERVED month's, ranked
by absolute swing. Composes the YoY idiom (lag window over the
calendar-bounded grain) with the TakeOrdered leaderboard discipline —
the cross-grain diff that a naive self-join-per-month would do with
an extra shuffle.

Exactness: revenue accumulates in decimal (the q1 DISC_PRICE idiom —
exact, associative, partition-order-free); the delta is a decimal
subtraction; only the final rendering casts to double. First observed
month per brand has no predecessor and is excluded (a delta against
nothing is not a move).

Scale: one fact-fact join pruned to 3 columns (the q3 shape, AQE-
decided build side), the brand dim join broadcast-eligible, ONE
map-side-combined (brand, month) aggregate — brand×month bounded
grain — then a lag window PARTITIONED BY brand over that bounded
spine and a top-20 TakeOrdered on |delta|. Never a global sort.

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-13 grading window — first
driver slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

MOVERS_TOP = 20

_REV_DEC = (
    "sum(cast(cast(l_extendedprice as decimal(18,2))"
    " * cast(1 - l_discount as decimal(18,2)) as decimal(18,4)))"
)


def q_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_brand, month, rev, prev_rev, delta): top-20 brand-month
    cells by absolute month-over-month revenue swing."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.trunc(F.to_date("o_orderdate"), "month").alias("month")
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "month")
        .agg(F.expr(_REV_DEC).alias("rev_dec"))
    )
    w = Window.partitionBy("p_brand").orderBy("month")
    with_prev = cells.withColumn(
        "prev_dec", F.lag("rev_dec").over(w)
    ).filter(F.col("prev_dec").isNotNull())
    return (
        with_prev.select(
            "p_brand",
            "month",
            F.expr("cast(rev_dec as double)").alias("rev"),
            F.expr("cast(prev_dec as double)").alias("prev_rev"),
            F.expr("cast(rev_dec - prev_dec as double)").alias("delta"),
        )
        .orderBy(
            F.expr("abs(rev_dec - prev_dec)").desc(),
            F.col("p_brand").asc(),
            F.col("month").asc(),
        )
        .limit(MOVERS_TOP)
    )


Q_TOP_MOVERS_SQL = f"""
WITH cells AS (
  SELECT p.p_brand,
         date_trunc('month', cast(o.o_orderdate AS date))::date AS month,
         {_REV_DEC} AS rev_dec
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
with_prev AS (
  SELECT p_brand, month, rev_dec,
         lag(rev_dec) OVER (PARTITION BY p_brand ORDER BY month)
           AS prev_dec
  FROM cells
)
SELECT p_brand, month,
       cast(rev_dec AS double) AS rev,
       cast(prev_dec AS double) AS prev_rev,
       cast(rev_dec - prev_dec AS double) AS delta
FROM with_prev
WHERE prev_dec IS NOT NULL
ORDER BY abs(rev_dec - prev_dec) DESC, p_brand, month
LIMIT {MOVERS_TOP}
"""


MOVERS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_top_movers": q_top_movers,
}

MOVERS_ORACLES: dict[str, str] = {
    "q_top_movers": Q_TOP_MOVERS_SQL,
}
