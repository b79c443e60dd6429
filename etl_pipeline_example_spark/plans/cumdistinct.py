"""Exact cumulative distinct users per day — without distinct-in-window.

The naive formulation (``count(DISTINCT user) OVER (ORDER BY day)``)
re-scans every prior day's users per output row and keeps an unbounded
distinct set in window state — a non-starter at 100 TB. The classic
scale-out identity: cumulative distinct = running sum of FIRST-SEEN
counts. Each user contributes exactly once, on their first active day,
so one user-keyed min() aggregate plus a day-keyed count gives the
same number with two map-side-combined shuffles and no window state.

Output grain is the calendar day — bounded by the data's date span
(~2.4k rows for the 1995-2001 corpus, invariant under SF), so the one
ordering window runs over a domain-bounded frame (the bitmapdow /
seqgaps adjudication), not over row-scale data.

Scale: shuffle #1 hashes users (first-seen min, map-side combined);
shuffle #2 hashes days for both the new-user count and the
daily-active count (one exchange serves both via the shared day key);
the final cumulative sum is a window over the bounded day spine.

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-13 grading window — first
driver slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, n_active, n_new, cum_users): daily actives, first-time
    users, and the exact running distinct-user total."""
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    # one (d, user) dedup pass feeds BOTH day-grain aggregates
    day_user = ev.groupBy("d", "user_id").agg(F.count(F.lit(1)).alias("_n"))
    daily = day_user.groupBy("d").agg(F.count(F.lit(1)).alias("n_active"))
    first_seen = day_user.groupBy("user_id").agg(F.min("d").alias("d"))
    new_by_day = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("n_new"))
    spine = daily.join(new_by_day, "d", "left").select(
        "d", "n_active", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    # day-domain-bounded window (calendar days, SF-invariant)
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.withColumn("cum_users", F.sum("n_new").over(w))
        .orderBy("d")
    )


Q_CUMULATIVE_DISTINCT_SQL = """
WITH day_user AS (
  SELECT DISTINCT cast(ts AS date) AS d, user_id FROM events
),
daily AS (
  SELECT d, count(*) AS n_active FROM day_user GROUP BY d
),
first_seen AS (
  SELECT user_id, min(d) AS d FROM day_user GROUP BY user_id
),
new_by_day AS (
  SELECT d, count(*) AS n_new FROM first_seen GROUP BY d
)
SELECT daily.d, daily.n_active,
       coalesce(new_by_day.n_new, 0) AS n_new,
       cast(sum(coalesce(new_by_day.n_new, 0))
              OVER (ORDER BY daily.d ROWS UNBOUNDED PRECEDING)
            AS bigint) AS cum_users
FROM daily LEFT JOIN new_by_day ON daily.d = new_by_day.d
ORDER BY daily.d
"""


CUMDISTINCT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_cumulative_distinct": q_cumulative_distinct,
}

CUMDISTINCT_ORACLES: dict[str, str] = {
    "q_cumulative_distinct": Q_CUMULATIVE_DISTINCT_SQL,
}
