"""Hierarchical multi-resolution time rollup over the events stream
(the "hypertable continuous-aggregate" shape).

One panel holds the minute, hour, and day views of the event stream:
(resolution, bucket_ts, n_events, n_users, min_value, max_value).

The SCALE-RIGHT construction is hierarchical, not three independent
scans:

- additive metrics (counts, min/max) aggregate ONCE at minute grain —
  the only shuffle that sees every event — then hour rolls up from the
  minute aggregate and day from the hour aggregate: the classic
  continuous-aggregate cascade, where each further level shuffles only
  the previous level's bucket rows (≈ minutes, then hours — thousands
  of rows regardless of corpus size).
- COUNT DISTINCT does not roll up (a user active in two minutes of one
  hour is one hour-user), so distinct-user counts cascade on the
  narrow (bucket, user_id) SPINE instead: the minute spine is one
  distinct over (minute, user) pairs; the hour spine is a distinct of
  the minute spine's truncation (strictly smaller input), and so on —
  history text/values never ride the distinct shuffles.

Each cascade level is a multi-consumer frame (feeds both the output
union and the next level), so the two spines and the minute/hour
aggregates are tracked-persisted (simcore cache discipline).

The oracle is the naive formulation — three direct GROUP BYs unioned —
which the cascade must equal exactly: counts are additive, min/max
compose, and the spine distinct equals the direct distinct.

min/max of DOUBLE are order-free IEEE selections (exact cross-engine);
sums of doubles are deliberately NOT in the panel (addition-order
nondeterminism — the round-5 exactness rules).

No reference counterpart (the reference is a 305-LoC ETL example);
general-engine surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.simcore import (
    release_similarity_caches,
    tracked_persist,
)
from etl_pipeline_example_spark.sources.readers import read_table


def events_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(resolution, bucket_ts, n_events, n_users, min_value, max_value)
    at minute, hour, and day grain."""
    release_similarity_caches()
    events = read_table(spark, sf_dir, "events", parallel=True)
    base = events.select(
        F.date_trunc("minute", F.col("ts")).alias("bucket_ts"),
        "user_id",
        "value",
    )

    # additive cascade: minute sees every event once; hour/day see only
    # the previous level's buckets
    minute_agg = tracked_persist(
        base.groupBy("bucket_ts").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    hour_agg = tracked_persist(
        minute_agg.groupBy(
            F.date_trunc("hour", F.col("bucket_ts")).alias("bucket_ts")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    day_agg = hour_agg.groupBy(
        F.date_trunc("day", F.col("bucket_ts")).alias("bucket_ts")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )

    # distinct-user cascade on the narrow (bucket, user) spine
    mu = tracked_persist(base.select("bucket_ts", "user_id").distinct())
    hu = tracked_persist(
        mu.select(
            F.date_trunc("hour", F.col("bucket_ts")).alias("bucket_ts"), "user_id"
        ).distinct()
    )
    du = hu.select(
        F.date_trunc("day", F.col("bucket_ts")).alias("bucket_ts"), "user_id"
    ).distinct()

    def level(agg: DataFrame, spine: DataFrame, name: str) -> DataFrame:
        users = spine.groupBy("bucket_ts").agg(F.count(F.lit(1)).alias("n_users"))
        return agg.join(users, "bucket_ts").select(
            F.lit(name).alias("resolution"),
            "bucket_ts",
            "n_events",
            "n_users",
            "min_value",
            "max_value",
        )

    return (
        level(minute_agg, mu, "minute")
        .unionAll(level(hour_agg, hu, "hour"))
        .unionAll(level(day_agg, du, "day"))
        .orderBy("resolution", "bucket_ts")
    )


_LEVEL_SQL = """
SELECT '{name}' AS resolution,
       cast(date_trunc('{name}', ts) as timestamp) AS bucket_ts,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY 2
"""

EVENTS_ROLLUP_MULTI_SQL = (
    _LEVEL_SQL.format(name="minute")
    + " UNION ALL "
    + _LEVEL_SQL.format(name="hour")
    + " UNION ALL "
    + _LEVEL_SQL.format(name="day")
    + " ORDER BY resolution, bucket_ts"
)


TIMEROLLUP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_rollup_multi": events_rollup_multi,
}

TIMEROLLUP_ORACLES: dict[str, str] = {
    "events_rollup_multi": EVENTS_ROLLUP_MULTI_SQL,
}
