"""Peak session concurrency: how many sessions run at once.

Capacity planning's first question — the peak, not the count. The
interval-stabbing classic: every session contributes a +1 delta at its
start and a −1 at its end, and the running sum of deltas in time order
IS the live-session count; the day's peak is its max. Sessions are
CLOSED intervals — a user is active at their last event's instant, so
a single-event session is live (peak ≥ 1) rather than erased by a
cancelling delta pair. Closed means starts sort before ends at the
same instant, and the full tie order (t, delta DESC, user_id,
session_seq) is total, so the running sum is engine-independent.

Sessions come from the certified gap-sessionizer (plans/queries.py
q_sessionize — imported, not forked; the oracle nests the registered
Q_SESSIONIZE_SQL as a CTE, the established composition pattern). Days
key by session START date: a day's panel reads "among sessions started
that day, the most alive at one instant" — crisp semantics with no
midnight splitting, and the rare cross-midnight tail still decrements
on the start day's timeline where it can only lower later counts.

Scale shape: the sessionizer's one (user) exchange; deltas are narrow
4-column rows; the running sum partitions by DAY (bounded frames,
never a global timeline); peak is a map-side-combined max.

No reference counterpart (305-LoC Glue ETL); engine surface, SURVEY.md
§2. Registered beyond the round-12 grading window — first driver slot
round 13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.plans.queries import (
    Q_SESSIONIZE_SQL,
    q_sessionize,
)


def q_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_sessions, peak_concurrent): per start-day session count
    and the maximum number of simultaneously live sessions."""
    sessions = q_sessionize(spark, sf_dir).select(
        "user_id",
        "session_seq",
        F.expr("CAST(session_start AS DATE)").alias("day"),
        "session_start",
        "session_end",
    )
    deltas = sessions.select(
        "day",
        F.col("session_start").alias("t"),
        F.lit(1).alias("delta"),
        "user_id",
        "session_seq",
    ).unionAll(
        sessions.select(
            "day",
            F.col("session_end").alias("t"),
            F.lit(-1).alias("delta"),
            "user_id",
            "session_seq",
        )
    )
    w = Window.partitionBy("day").orderBy(
        "t", F.col("delta").desc(), "user_id", "session_seq"
    )
    running = deltas.withColumn(
        "live", F.sum("delta").over(w).cast("long")
    )
    return (
        running.groupBy("day")
        .agg(F.max("live").alias("peak_concurrent"))
        .join(
            sessions.groupBy("day").agg(
                F.count(F.lit(1)).alias("n_sessions")
            ),
            "day",
        )
        .select("day", "n_sessions", "peak_concurrent")
        .orderBy("day")
    )


Q_CONCURRENCY_PEAK_SQL = f"""
WITH sessions_raw AS ({Q_SESSIONIZE_SQL}),
sessions AS (
  SELECT user_id, session_seq, CAST(session_start AS DATE) AS day,
         session_start, session_end
  FROM sessions_raw
),
deltas AS (
  SELECT day, session_start AS t, 1 AS delta, user_id, session_seq
  FROM sessions
  UNION ALL
  SELECT day, session_end AS t, -1 AS delta, user_id, session_seq
  FROM sessions
),
running AS (
  SELECT day,
         cast(sum(delta) OVER (PARTITION BY day
              ORDER BY t, delta DESC, user_id, session_seq
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS bigint) AS live
  FROM deltas
)
SELECT r.day, s.n_sessions, r.peak_concurrent FROM (
  SELECT day, max(live) AS peak_concurrent FROM running GROUP BY day
) r JOIN (
  SELECT day, count(*) AS n_sessions FROM sessions GROUP BY day
) s ON s.day = r.day
ORDER BY r.day
"""


CONCURRENCY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_concurrency_peak": q_concurrency_peak,
}

CONCURRENCY_ORACLES: dict[str, str] = {
    "q_concurrency_peak": Q_CONCURRENCY_PEAK_SQL,
}
