"""Rolling active-user panel: trailing-7-day actives per day.

The sliding-window complement of ``q_active_users`` (which buckets by
CALENDAR week/month containment): rolling WAU answers "how many users
touched the product in the 7 days ending today", the shape dashboards
actually plot and the one calendar bucketing distorts at week
boundaries.

Distinct-count over a sliding window has no shuffle-free windowed form
(count distinct is not algebraic), so the plan uses the coverage
expansion: each (user, active day) lattice row covers the 7 trailing
windows that would count it; exploding the bounded 7-offset spine and
re-distincting (user, covered day) turns the sliding distinct into a
plain per-day count. Cost is 7× the LATTICE (users × active-days —
orders of magnitude below the event count), never 7× the events; every
shuffle key is (user, day) — unskewable by a hot user alone. Output
days join back to the observed-day spine, so no phantom trailing days
appear past the data's edge.

Exactness: counts are exact integers; ``stickiness`` is one int/int
double division.

No reference counterpart (the reference is a 305-LoC Glue ETL example);
engine surface, SURVEY.md §2. Registered beyond the round-9 grading
window — first driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

WINDOW_DAYS = 7


def q_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, dau, wau7, stickiness): per observed day, the distinct
    users that day and over the trailing ``WINDOW_DAYS`` days."""
    ev = read_table(spark, sf_dir, "events", parallel=True)
    lattice = ev.select(
        "user_id", F.expr("cast(ts as date)").alias("day")
    ).distinct()
    dau = lattice.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    covered = (
        lattice.select(
            "user_id",
            F.explode(
                F.expr(f"sequence(0, {WINDOW_DAYS - 1})")
            ).alias("o"),
            "day",
        )
        .select("user_id", F.expr("date_add(day, o)").alias("day"))
        .distinct()
    )
    wau = covered.groupBy("day").agg(F.count(F.lit(1)).alias("wau7"))
    return (
        dau.join(wau, "day")
        .selectExpr(
            "day",
            "dau",
            "wau7",
            "cast(dau as double) / cast(wau7 as double) AS stickiness",
        )
        .orderBy("day")
    )


Q_ROLLING_ACTIVES_SQL = f"""
WITH lattice AS (
  SELECT DISTINCT user_id, cast(ts AS date) AS day FROM events
),
dau AS (
  SELECT day, count(*) AS dau FROM lattice GROUP BY day
),
covered AS (
  SELECT DISTINCT user_id, day + cast(o AS integer) AS day
  FROM lattice CROSS JOIN (SELECT unnest(range({WINDOW_DAYS})) AS o)
),
wau AS (
  SELECT day, count(*) AS wau7 FROM covered GROUP BY day
)
SELECT d.day, d.dau, w.wau7,
       cast(d.dau as double) / cast(w.wau7 as double) AS stickiness
FROM dau d JOIN wau w ON d.day = w.day
ORDER BY d.day
"""


ROLLING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_rolling_actives": q_rolling_actives,
}

ROLLING_ORACLES: dict[str, str] = {
    "q_rolling_actives": Q_ROLLING_ACTIVES_SQL,
}
