"""Session-depth histogram over the certified gap-sessionizer.

The engagement-shape readout between q_bounce_rate's single-number
share and q_event_path's sequence mining: how many sessions have 1,
2, 3… events. Product teams read the whole curve (a fat head is a
bounce problem, a long tail is power-user concentration); the
histogram grain also makes the oracle comparison pin every session
boundary — one mis-split session anywhere moves two cells.

Sessions come from the certified gap-sessionizer (q_sessionize
imported; oracle nests Q_SESSIONIZE_SQL — the composition pattern).
Depth is the sessionizer's own exact event count; the histogram and
its share column are one bounded fold (depth domain ≤ the longest
session) plus a single double division per cell.

Scale: the sessionizer's one (user) exchange is the only corpus
shuffle; the histogram is a map-side-combined fold over session rows.

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-13 grading window — first
driver slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.plans.queries import (
    Q_SESSIONIZE_SQL,
    q_sessionize,
)


def q_session_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(depth, n_sessions, share): how many sessions contain exactly
    ``depth`` events, with each cell's share of all sessions."""
    sessions = q_sessionize(spark, sf_dir).select(
        F.col("n_events").alias("depth")
    )
    hist = sessions.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    return (
        hist.withColumn(
            "share",
            F.expr(
                "cast(n_sessions as double)"
                " / cast(sum(n_sessions) over () as double)"
            ),
        )
        .orderBy("depth")
    )


Q_SESSION_DEPTH_HIST_SQL = f"""
WITH sessions AS ({Q_SESSIONIZE_SQL}),
hist AS (
  SELECT n_events AS depth, count(*) AS n_sessions
  FROM sessions GROUP BY 1
)
SELECT depth, n_sessions,
       cast(n_sessions AS double)
         / cast(sum(n_sessions) OVER () AS double) AS share
FROM hist
ORDER BY depth
"""


SESSIONDEPTH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_session_depth_hist": q_session_depth_hist,
}

SESSIONDEPTH_ORACLES: dict[str, str] = {
    "q_session_depth_hist": Q_SESSION_DEPTH_HIST_SQL,
}
