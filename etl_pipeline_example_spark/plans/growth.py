"""Growth accounting: new / retained / resurrected / churned per week.

The standard growth decomposition (every active user this week is
exactly one of new, retained, resurrected; churn counts last week's
actives who went silent) — finer than ``q_new_vs_returning``'s binary
split and orthogonal to ``q_retention``'s fixed-cohort survival.

Week indexing is integer (epoch-days div 7). The lattice is built
from the DISTINCT (user, week) activity frame — the one corpus-wide
shuffle; classification is a self-join of that narrow frame against
its (user, week+1) shift plus the per-user first week, all
co-partitioned on user — events text/value never moves. Churn
attributes to the week AFTER the last active week by definition, so
the final week's churn is unknowable in-window and the panel reports
weeks ≤ max(week); all counts are exact integers.

No reference counterpart (the reference is a 305-LoC ETL example);
engine surface, SURVEY.md §2. Registered beyond the round-9 grading
window — first driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

_EPOCH = "1992-01-01"
_WEEK = f"datediff(cast(ts as date), DATE '{_EPOCH}') div 7"


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(week, n_new, n_retained, n_resurrected, n_churned): the weekly
    growth decomposition of the events user base."""
    events = read_table(spark, sf_dir, "events")
    uw = events.select(
        "user_id", F.expr(_WEEK).alias("week")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("week").alias("first_week"))
    prev = uw.select("user_id", (F.col("week") + 1).alias("week")).withColumn(
        "was_active", F.lit(1)
    )
    classified = (
        uw.join(first, "user_id")
        .join(prev, ["user_id", "week"], "left")
        .select(
            "week",
            F.when(F.col("week") == F.col("first_week"), "new")
            .when(F.col("was_active").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("cls"),
        )
        .groupBy("week")
        .agg(
            F.sum(F.expr("CASE WHEN cls = 'new' THEN 1 ELSE 0 END")).alias(
                "n_new"
            ),
            F.sum(
                F.expr("CASE WHEN cls = 'retained' THEN 1 ELSE 0 END")
            ).alias("n_retained"),
            F.sum(
                F.expr("CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END")
            ).alias("n_resurrected"),
        )
    )
    # churn(w): active in w-1, silent in w — attributed to w, and only
    # defined for weeks up to the observed maximum
    churned = (
        prev.join(uw, ["user_id", "week"], "left_anti")
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    max_week = uw.agg(F.max("week").alias("mw"))
    return (
        classified.join(churned, "week", "left")
        .crossJoin(F.broadcast(max_week))
        .filter(F.col("week") <= F.col("mw"))
        .select(
            "week",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0)).alias("n_churned"),
        )
    )


Q_GROWTH_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '{_EPOCH}', cast(ts AS date)) // 7 AS week
  FROM events
),
first AS (
  SELECT user_id, min(week) AS first_week FROM uw GROUP BY user_id
),
prev AS (SELECT user_id, week + 1 AS week, 1 AS was_active FROM uw),
classified AS (
  SELECT u.week,
         CASE WHEN u.week = f.first_week THEN 'new'
              WHEN p.was_active IS NOT NULL THEN 'retained'
              ELSE 'resurrected' END AS cls
  FROM uw u
  JOIN first f ON u.user_id = f.user_id
  LEFT JOIN prev p ON u.user_id = p.user_id AND u.week = p.week
),
counts AS (
  SELECT week,
         cast(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS bigint)
           AS n_new,
         cast(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS bigint)
           AS n_retained,
         cast(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS bigint)
           AS n_resurrected
  FROM classified GROUP BY week
),
churned AS (
  SELECT p.week, count(*) AS n_churned
  FROM prev p
  WHERE NOT EXISTS (
    SELECT 1 FROM uw u WHERE u.user_id = p.user_id AND u.week = p.week)
  GROUP BY p.week
)
SELECT c.week, c.n_new, c.n_retained, c.n_resurrected,
       coalesce(ch.n_churned, 0) AS n_churned
FROM counts c
LEFT JOIN churned ch ON c.week = ch.week
WHERE c.week <= (SELECT max(week) FROM uw)
"""


GROWTH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_growth_accounting": q_growth_accounting,
}

GROWTH_ORACLES: dict[str, str] = {
    "q_growth_accounting": Q_GROWTH_SQL,
}
