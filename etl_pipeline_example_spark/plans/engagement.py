"""Engagement accounting and semi-structured schema discovery.

  q_active_users   the DAU/WAU/MAU board: distinct active users per
                   day, per ISO week, per month, joined on the day's
                   containing week/month, plus the DAU/MAU stickiness
                   ratio — the engagement panel every event pipeline
                   serves. Three grain aggregates (each a two-phase
                   count-distinct) joined at day grain.
  q_props_schema   schema DISCOVERY over the JSON props column (the
                   step BEFORE q_json_extract's typed extraction):
                   enumerate each event's TOP-LEVEL props keys, report
                   per-key coverage — presence count and fraction of
                   events carrying the key. Spark uses
                   json_object_keys, DuckDB json_keys: both are
                   top-level key enumerations robust to nested or
                   non-string values, no flat-map assumption.

No reference counterpart (the reference is a 305-LoC ETL example);
general query-engine surface, SURVEY.md §2 rows 20z9 and 20m1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, dau, wau, mau, stickiness): daily actives with the
    containing week's and month's actives and the DAU/MAU ratio."""
    ev = read_table(spark, sf_dir, "events", parallel=True).select(
        "user_id",
        F.expr("cast(ts as date)").alias("day"),
        F.expr("cast(date_trunc('week', ts) as date)").alias("week"),
        F.expr("cast(date_trunc('month', ts) as date)").alias("month"),
    )
    dau = ev.groupBy("day", "week", "month").agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = ev.groupBy("week").agg(F.countDistinct("user_id").alias("wau"))
    mau = ev.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(wau, "week")
        .join(mau, "month")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.expr(
                "round(cast(dau as double) / cast(mau as double), 6)"
            ).alias("stickiness"),
        )
    )


Q_ACTIVE_USERS_SQL = """
WITH ev AS (
  SELECT user_id, cast(ts AS date) AS day,
         cast(date_trunc('week', ts) AS date) AS week,
         cast(date_trunc('month', ts) AS date) AS month
  FROM events
),
dau AS (
  SELECT day, week, month, count(DISTINCT user_id) AS dau
  FROM ev GROUP BY 1, 2, 3
),
wau AS (SELECT week, count(DISTINCT user_id) AS wau FROM ev GROUP BY 1),
mau AS (SELECT month, count(DISTINCT user_id) AS mau FROM ev GROUP BY 1)
SELECT d.day, d.dau, w.wau, m.mau,
       round(cast(d.dau AS double) / cast(m.mau AS double), 6) AS stickiness
FROM dau d JOIN wau w USING (week) JOIN mau m USING (month)
"""


def q_props_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key, n_present, coverage): every key appearing in the props
    JSON, how many events carry it, and the fraction of all events."""
    ev = read_table(spark, sf_dir, "events", parallel=True)
    total = ev.agg(F.count(F.lit(1)).alias("n_total"))
    keys = (
        ev.select(
            F.explode(F.expr("json_object_keys(props)")).alias("key")
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_present"))
    )
    return (
        keys.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_present",
            F.expr(
                "round(cast(n_present as double) / cast(n_total as double), 6)"
            ).alias("coverage"),
        )
        .orderBy(F.col("n_present").desc(), F.col("key").asc())
    )


Q_PROPS_SCHEMA_SQL = """
WITH total AS (SELECT count(*) AS n_total FROM events),
keys AS (
  SELECT unnest(json_keys(props)) AS key FROM events
),
counts AS (SELECT key, count(*) AS n_present FROM keys GROUP BY 1)
SELECT c.key, c.n_present,
       round(cast(c.n_present AS double) / cast(t.n_total AS double), 6)
         AS coverage
FROM counts c, total t
ORDER BY n_present DESC, key
"""


ENGAGEMENT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_active_users": q_active_users,
    "q_props_schema": q_props_schema,
}

ENGAGEMENT_ORACLES: dict[str, str] = {
    "q_active_users": Q_ACTIVE_USERS_SQL,
    "q_props_schema": Q_PROPS_SCHEMA_SQL,
}
