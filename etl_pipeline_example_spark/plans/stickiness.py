"""DAU/WAU stickiness per ISO week, in exact rational arithmetic.

The product-health ratio every engagement dashboard carries: how much
of the weekly audience shows up on an average active day. stickiness
= (Σ daily distinct actives over the week) / (active_days × weekly
distinct actives) — all three terms are exact integers from one
(day, user) dedup pass (active_days is the OBSERVED day count, so
edge-partial weeks don't dilute the ratio), and the metric is a
single correctly-rounded double division. No float is ever summed
(the HHI / Gini–Simpson discipline).

Scale: ONE (day, user) dedup shuffle feeds both grains — the daily
count rolls up from it, and the weekly distinct rolls up from its
(week, user) projection (a second dedup over already-deduped rows,
map-side combined, strictly smaller input). Output is week-grain:
bounded by the calendar, invariant under SF. No windows, no joins
beyond the bounded week-grain merge.

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-13 grading window — first
driver slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(week, n_days, dau_sum, wau, stickiness): DAU/WAU per ISO week;
    stickiness = dau_sum / (n_days * wau) over observed active days."""
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    day_user = ev.groupBy("d", "user_id").agg(F.count(F.lit(1)).alias("_n"))
    daily = day_user.groupBy("d").agg(F.count(F.lit(1)).alias("n_active"))
    dau = (
        daily.groupBy(F.trunc("d", "week").alias("week"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n_active").alias("dau_sum"),
        )
    )
    wau = (
        day_user.select(F.trunc("d", "week").alias("week"), "user_id")
        .groupBy("week", "user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(wau, "week")
        .withColumn(
            "stickiness",
            F.expr(
                "cast(dau_sum as double)"
                " / (cast(n_days as double) * cast(wau as double))"
            ),
        )
        .select("week", "n_days", "dau_sum", "wau", "stickiness")
        .orderBy("week")
    )


Q_STICKINESS_SQL = """
WITH day_user AS (
  SELECT DISTINCT cast(ts AS date) AS d, user_id FROM events
),
daily AS (
  SELECT d, count(*) AS n_active FROM day_user GROUP BY d
),
dau AS (
  SELECT date_trunc('week', d)::date AS week,
         count(*) AS n_days, sum(n_active) AS dau_sum
  FROM daily GROUP BY 1
),
wau AS (
  SELECT week, count(*) AS wau FROM (
    SELECT DISTINCT date_trunc('week', d)::date AS week, user_id
    FROM day_user
  ) GROUP BY week
)
SELECT dau.week, dau.n_days,
       cast(dau_sum AS bigint) AS dau_sum,
       wau,
       cast(dau_sum AS double)
         / (cast(dau.n_days AS double) * cast(wau AS double)) AS stickiness
FROM dau JOIN wau ON dau.week = wau.week
ORDER BY dau.week
"""


STICKINESS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_stickiness": q_stickiness,
}

STICKINESS_ORACLES: dict[str, str] = {
    "q_stickiness": Q_STICKINESS_SQL,
}
