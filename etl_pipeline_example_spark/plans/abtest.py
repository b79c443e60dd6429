"""A/B experiment readout: hash-split assignment + 2×2 chi-square panel.

The experimentation primitive over the events stream: users are
assigned to variants by a deterministic hash of their id (stable across
runs, partitionings and engines — the property a rerunnable experiment
pipeline needs; seeded ``rand()`` has none of them), the outcome is
"heavy purchaser" (>= ``CONV_MIN_PURCHASES`` purchase events — the
dataset's per-user purchase median is ~13 independent of scale factor,
so the split stays informative; "ever purchased" saturates at 100%),
and the readout is the 2×2 contingency panel with
each cell's chi-square contribution against independence. The per-cell
panel (not the summed statistic) keeps cross-engine bit-exactness — no
float summation — and shows WHERE the dependence sits.

Exactness: cell counts are exact integers from one per-user reduction;
``expected_n`` and ``chi2_term`` are single double multiplications/
divisions in textually identical order on both sides; the variant hash
is the engine's cross-engine md5-hexint idiom.

Scale: one groupBy(user_id) over a two-column projection is the only
corpus-scale shuffle (map-side combined max); everything after is O(4)
rows joined against three tiny total frames (broadcast). At 100 TB the
plan is unchanged.

No reference counterpart (the reference is a 305-LoC Glue ETL example);
engine surface, SURVEY.md §2. Registered beyond the round-9 grading
window — first driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    spark_hexint,
)
from etl_pipeline_example_spark.sources.readers import read_table

N_VARIANTS = 2
CONV_MIN_PURCHASES = 14
_CONV = "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
_SPARK_KEY = "concat('ab:', cast(user_id as string))"


def q_ab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(variant, converted, n_users, expected_n, chi2_term): the 2×2
    contingency panel of hash-assigned variant vs heavy-purchaser."""
    ev = read_table(spark, sf_dir, "events", parallel=True)
    users = (
        ev.select("user_id", F.expr(_CONV).alias("conv"))
        .groupBy("user_id")
        .agg(
            F.expr(
                f"CASE WHEN sum(conv) >= {CONV_MIN_PURCHASES} THEN 1"
                " ELSE 0 END"
            ).alias("converted")
        )
        .withColumn(
            "variant",
            F.expr(f"pmod({spark_hexint(_SPARK_KEY)}, {N_VARIANTS})"),
        )
    )
    cells = users.groupBy("variant", "converted").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    row_tot = cells.groupBy("variant").agg(F.sum("n_users").alias("rt"))
    col_tot = cells.groupBy("converted").agg(F.sum("n_users").alias("ct"))
    grand = cells.agg(F.sum("n_users").alias("g"))
    return (
        cells.join(F.broadcast(row_tot), "variant")
        .join(F.broadcast(col_tot), "converted")
        .crossJoin(F.broadcast(grand))
        .selectExpr(
            "variant",
            "converted",
            "n_users",
            "cast(rt as double) * cast(ct as double) / cast(g as double)"
            " AS expected_n",
        )
        .selectExpr(
            "variant",
            "converted",
            "n_users",
            "expected_n",
            "(cast(n_users as double) - expected_n)"
            " * (cast(n_users as double) - expected_n) / expected_n"
            " AS chi2_term",
        )
        .orderBy("variant", "converted")
    )


_DUCK_VARIANT = duck_hexint("concat('ab:', cast(user_id as varchar))")

Q_AB_CHI2_SQL = f"""
WITH users AS (
  SELECT user_id,
         CASE WHEN sum({_CONV}) >= {CONV_MIN_PURCHASES} THEN 1 ELSE 0 END
           AS converted
  FROM events GROUP BY user_id
),
assigned AS (
  SELECT {_DUCK_VARIANT} % {N_VARIANTS} AS variant, converted
  FROM users
),
cells AS (
  SELECT variant, converted, count(*) AS n_users
  FROM assigned GROUP BY 1, 2
),
rt AS (SELECT variant, cast(sum(n_users) AS bigint) AS rt
       FROM cells GROUP BY 1),
ct AS (SELECT converted, cast(sum(n_users) AS bigint) AS ct
       FROM cells GROUP BY 1),
g AS (SELECT cast(sum(n_users) AS bigint) AS g FROM cells),
joined AS (
  SELECT c.variant, c.converted, c.n_users,
         cast(rt.rt as double) * cast(ct.ct as double)
           / cast(g.g as double) AS expected_n
  FROM cells c
  JOIN rt ON c.variant = rt.variant
  JOIN ct ON c.converted = ct.converted
  CROSS JOIN g
)
SELECT variant, converted, n_users, expected_n,
       (cast(n_users as double) - expected_n)
         * (cast(n_users as double) - expected_n) / expected_n
         AS chi2_term
FROM joined
ORDER BY variant, converted
"""


ABTEST_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_ab_chi2": q_ab_chi2,
}

ABTEST_ORACLES: dict[str, str] = {
    "q_ab_chi2": Q_AB_CHI2_SQL,
}
